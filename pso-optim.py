#!/usr/bin/env python
"""Second PSO HPO entry point (reference pso-optim.py:501-598): stability
scoring against the (G=1.0, D=1.3) loss bands, FID off, num_epoch=5 per
particle evaluation. Thin preset wrapper over ddgan_tpu.pso.cli."""
import sys

from ddgan_tpu.pso.cli import main

if __name__ == "__main__":
    main(["--preset", "pso-optim", *sys.argv[1:]])
