#!/usr/bin/env python
"""Sampling + FID evaluation entry point (reference-compatible CLI).

NOTE: like the reference, this is an inference CLI, not a unit test —
the unit tests live in tests/.
"""
from ddgan_tpu.cli.test_cli import main

if __name__ == "__main__":
    main()
