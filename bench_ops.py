#!/usr/bin/env python
"""Microbenchmark: Pallas vs XLA FIR resampling on the current backend.

Times the two hot upfirdn2d specializations at DDGAN-relevant shapes.
Usage: python bench_ops.py
"""

import time

import numpy as np


def timeit(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from ddgan_tpu.ops.pallas_upfirdn import down2x, up2x
    from ddgan_tpu.ops.upfirdn2d import upfirdn2d_ref

    fir = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = jnp.asarray(np.outer(fir, fir) / np.outer(fir, fir).sum())
    k1 = tuple((fir / fir.sum()).tolist())
    k2u = k2 * 4
    k1u = tuple((fir / fir.sum() * 2).tolist())

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    from ddgan_tpu.ops.pallas_upfirdn import fits_vmem
    shapes = [
        (64, 32, 32, 128),   # CIFAR D conv2 down
        (64, 16, 16, 256),
        (64, 8, 8, 512),
        (8, 64, 64, 128),    # LUNA16 64^2 (falls back to XLA if too big)
    ]
    for shape in shapes:
        if not fits_vmem(*shape, jnp.float32):
            print(f"skip {shape}: exceeds VMEM gate (XLA fallback in dispatcher)")
            continue
        x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
        f_x = jax.jit(lambda v: upfirdn2d_ref(v, k2, up=1, down=2, pad=(1, 1)))
        f_p = jax.jit(lambda v: down2x(v, k1))
        tx = timeit(f_x, x)
        tp = timeit(f_p, x)
        gb = x.size * 4 * 1.25 / 1e9  # read + quarter-size write
        print(
            f"down2x {shape}: xla {tx*1e6:8.1f}us ({gb/tx:6.1f} GB/s)  "
            f"pallas {tp*1e6:8.1f}us ({gb/tp:6.1f} GB/s)  speedup {tx/tp:5.2f}x"
        )
        u_x = jax.jit(lambda v: upfirdn2d_ref(v, k2u, up=2, down=1, pad=(2, 1)))
        u_p = jax.jit(lambda v: up2x(v, k1u))
        tx = timeit(u_x, x)
        tp = timeit(u_p, x)
        gb = x.size * 4 * 5.0 / 1e9  # read + 4x-size write
        print(
            f"up2x   {shape}: xla {tx*1e6:8.1f}us ({gb/tx:6.1f} GB/s)  "
            f"pallas {tp*1e6:8.1f}us ({gb/tp:6.1f} GB/s)  speedup {tx/tp:5.2f}x"
        )


if __name__ == "__main__":
    main()
