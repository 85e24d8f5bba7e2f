#!/usr/bin/env python
"""PSO hyperparameter search entry point (reference-compatible CLI)."""
from ddgan_tpu.pso.cli import main

if __name__ == "__main__":
    main()
