#!/usr/bin/env python
"""Training entry point (reference-compatible CLI). See ddgan_tpu.cli.train_cli."""
from ddgan_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
