#!/usr/bin/env python
"""Write the default config JSON (reference: additionals/create_conf_default.py).

Usage: python create_conf_default.py [--save_dir ./configs] [--filename config.json]
"""

import argparse
from pathlib import Path

from ddgan_tpu.config import Config


def main(argv=None):
    p = argparse.ArgumentParser("create default DDGAN config")
    p.add_argument("--save_dir", default="./configs")
    p.add_argument("--filename", default="config.json")
    args = p.parse_args(argv)
    path = Path(args.save_dir) / args.filename
    Config().save(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
