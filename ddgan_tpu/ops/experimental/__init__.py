"""Experimental ops — real, tested code that does not (yet) win at runtime.

pallas_upfirdn: fused Pallas 2x FIR kernels (reference counterpart:
score_sde/op/upfirdn2d_kernel.cu:109-368), rewritten in round 2 as
transpose-free MXU banded-matmul dot_generals with both passes in one
VMEM round-trip. Measured on TPU v5e with bench_ops.py's
chained-roundtrip timing (2026-08-17): matmul 220 ≈ conv 218 ≈ Pallas
203 GB/s at the (64,32,32,128) roundtrip, with ~±8% run-to-run spread —
a tie within noise, not a win (round 1's polyphase VPU kernels were at
87-160 GB/s), so the banded-matmul XLA formulation stays the default.
They stay golden-tested (tests/test_pallas_fir.py) and reachable via
DDGAN_TPU_PALLAS_FIR=1 for future tuning.
"""

from .pallas_upfirdn import down2x, fits_vmem, up2x

__all__ = ["down2x", "up2x", "fits_vmem"]
