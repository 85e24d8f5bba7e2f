#!/usr/bin/env python
"""Microbenchmark: FIR resampling implementations on the current backend.

Compares the three upfirdn2d implementations on the hot factor-2 patterns:
  conv   — lax.conv_general_dilated (ops/upfirdn2d.upfirdn2d_ref)
  matmul — separable banded-matmul MXU formulation (upfirdn2d_matmul)
  pallas — hand-written polyphase kernels (pallas_upfirdn)

The remote-device tunnel costs ~0.7 ms per dispatch, so each measurement
CHAINS K up2x->down2x roundtrips inside ONE jit (shape-preserving, no CSE:
each iteration consumes the previous output) and reports per-roundtrip
time. Traffic model per roundtrip: up reads S writes 4S, down reads 4S
writes S -> 10S bytes moved.

Usage: python bench_ops.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ddgan_tpu.ops.experimental.pallas_upfirdn import down2x, up2x, fits_vmem
    from ddgan_tpu.ops.upfirdn2d import upfirdn2d_matmul, upfirdn2d_ref

    fir = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = jnp.asarray(np.outer(fir, fir) / np.outer(fir, fir).sum())
    k1 = tuple((fir / fir.sum()).tolist())
    k2u = k2 * 4
    k1u = tuple((fir / fir.sum() * 2).tolist())

    K = 20  # roundtrips chained inside one jit

    impls = {
        "conv": (
            lambda v: upfirdn2d_ref(v, k2u, up=2, down=1, pad=(2, 1)),
            lambda v: upfirdn2d_ref(v, k2, up=1, down=2, pad=(1, 1)),
        ),
        "matmul": (
            lambda v: upfirdn2d_matmul(v, k2u, up=2, down=1, pad=(2, 1)),
            lambda v: upfirdn2d_matmul(v, k2, up=1, down=2, pad=(1, 1)),
        ),
        "pallas": (
            lambda v: up2x(v, k1u),
            lambda v: down2x(v, k1),
        ),
    }

    def chained(up_fn, down_fn):
        def run(x):
            def body(_, v):
                return down_fn(up_fn(v))
            return jax.lax.fori_loop(0, K, body, x)
        return jax.jit(run)

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}, "
          f"K={K} chained roundtrips")
    shapes = [
        (64, 32, 32, 128),   # CIFAR D conv2 down / G up site
        (64, 16, 16, 256),
        (64, 8, 8, 512),
    ]
    for shape in shapes:
        x0 = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
        gb_rt = x0.size * 4 * 10.0 / 1e9  # bytes per roundtrip
        row = []
        for name, (u, d) in impls.items():
            n_, h_, w_, c_ = shape
            # the roundtrip runs down2x on the up'd (2h, 2w) intermediate
            if name == "pallas" and not fits_vmem(n_, 2 * h_, 2 * w_, c_, jnp.float32):
                row.append(f"{name}: skip(vmem)")
                continue
            f = chained(u, d)
            out = f(x0)
            _ = float(out.ravel()[0])  # value fetch = timing barrier
            t0 = time.perf_counter()
            out = f(x0)
            _ = float(out.ravel()[0])
            dt = (time.perf_counter() - t0) / K
            row.append(f"{name} {dt*1e6:7.1f}us/rt ({gb_rt/dt:6.1f} GB/s)")
        print(f"{shape}: " + "  ".join(row))


if __name__ == "__main__":
    main()
