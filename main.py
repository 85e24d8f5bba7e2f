#!/usr/bin/env python
"""Config-first training wrapper (reference-compatible CLI)."""
from ddgan_tpu.cli.main_cli import main

if __name__ == "__main__":
    main()
