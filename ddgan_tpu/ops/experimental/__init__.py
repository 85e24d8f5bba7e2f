"""Experimental ops — real, tested code that does NOT win at runtime.

pallas_upfirdn: hand-written Pallas polyphase 2x FIR kernels
(reference counterpart: score_sde/op/upfirdn2d_kernel.cu:109-368).
Measured on TPU v5e with bench_ops.py's chained-roundtrip timing
(2026-08-16): the banded-matmul MXU formulation (ops/upfirdn2d.py)
sustains ~204 GB/s on the (64,32,32,128) up2x/down2x roundtrip, the XLA
dilated-conv formulation ~128 GB/s, and these Pallas kernels trail both
(~87-160 GB/s; the polyphase phase-split reshapes relayout in VMEM).
They stay golden-tested (tests/test_pallas_fir.py) and reachable via
DDGAN_TPU_PALLAS_FIR=1 for future tuning, but are not a perf feature.
"""

from .pallas_upfirdn import down2x, fits_vmem, up2x

__all__ = ["down2x", "up2x", "fits_vmem"]
