#!/usr/bin/env python
"""Experiment: 3x3-conv formulations for the 256²/C=64 generator levels.

The batch-8 celeba256 profile (r3) shows G's 3x3 convs at C=64 running at
46-110 TFLOP/s while DiscriminatorLarge's C>=128 convs hit ~190: with only
64 output channels the MXU's 128 lanes are half idle, and the fused
GN/adaGN/SiLU prologue stalls the systolic array further (the r2 threefry
lesson). Two candidate restructures, measured head-to-head on the chip:

  conv   — plain lax.conv_general_dilated 3x3 (what flax emits), bf16
  pair   — PAIRED-PIXEL formulation: kernel widened to [3,4,C,2*Cout]
           (zeros where a tap doesn't belong to a sub-pixel), stride
           (1,2): each output position computes TWO adjacent output
           pixels as 2*Cout=128 lanes → full MXU width at 4/3x the
           FLOPs, then a reshape restores [B,H,W,Cout].

Each variant is also measured with the resblock's elementwise prologue
(GroupNorm-normalize + adaGN scale/shift + SiLU) fused in front, and in
forward+backward mode, chained K deep inside one jit (the tunnel costs
~0.7 ms/dispatch). Timing barrier is a VALUE fetch (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def widen_pair_kernel(w3: np.ndarray) -> np.ndarray:
    """[3,3,C,F] → [3,4,C,2F]: w4[ky,kx,c,p*F+f] = w3[ky,kx-p,c,f] (else 0)."""
    kh, kw, c, f = w3.shape
    assert (kh, kw) == (3, 3)
    w4 = np.zeros((3, 4, c, 2 * f), w3.dtype)
    for p in range(2):
        for kx in range(4):
            dx = kx - p
            if 0 <= dx <= 2:
                w4[:, kx, :, p * f : (p + 1) * f] = w3[:, dx]
    return w4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--full", action="store_true",
                    help="run ONLY the full-backward suite (input + "
                         "per-layer WEIGHT grads — the model-realistic "
                         "mode the original fwdbwd suite missed)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    B, S, C = args.batch, args.size, args.ch
    K = args.chain
    rng = np.random.RandomState(0)
    w3 = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
    w4 = widen_pair_kernel(w3)
    x0 = rng.randn(B, S, S, C).astype(np.float32)
    gamma = (1 + 0.1 * rng.randn(B, C)).astype(np.float32)
    beta = (0.1 * rng.randn(B, C)).astype(np.float32)

    w3_b = jnp.asarray(w3, jnp.bfloat16)
    w4_b = jnp.asarray(w4, jnp.bfloat16)
    g_b = jnp.asarray(gamma, jnp.bfloat16)
    b_b = jnp.asarray(beta, jnp.bfloat16)

    def conv3(v, w):
        return lax.conv_general_dilated(
            v, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_pair(v, w):
        y = lax.conv_general_dilated(
            v, w, (1, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, S, S//2, 2C) with channel = p*C + f  →  (B, S, S, C)
        return y.reshape(B, S, S // 2, 2, C).reshape(B, S, S, C)

    def prologue(v):
        # GroupNorm(32 groups) normalize + adaGN scale/shift + SiLU, the
        # chain XLA fuses into the conv prologue in the real model
        g = 32
        vg = v.reshape(B, S, S, g, C // g)
        mean = jnp.mean(vg.astype(jnp.float32), axis=(1, 2, 4), keepdims=True)
        var = jnp.var(vg.astype(jnp.float32), axis=(1, 2, 4), keepdims=True)
        n = ((vg - mean) * lax.rsqrt(var + 1e-6)).astype(v.dtype).reshape(v.shape)
        n = n * g_b[:, None, None, :] + b_b[:, None, None, :]
        return jax.nn.silu(n)

    def make(fn, with_prologue):
        def chain(v):
            for _ in range(K):
                v = fn(prologue(v) if with_prologue else v)
            return v

        fwd = jax.jit(chain)
        grad = jax.jit(jax.grad(lambda v: jnp.sum(chain(v).astype(jnp.float32))))
        return fwd, grad

    from ddgan_tpu.ops.experimental.pallas_conv import pair_conv3x3
    from ddgan_tpu.ops.s2d import widen_s2d_kernel

    w3_f = jnp.asarray(w3)
    bias0 = jnp.zeros((C,), jnp.float32)
    # width-only space-to-depth: [3,3,2C,2C] at (S, S/2) — layout-closed,
    # so the whole chain runs in s2d space with zero relayouts (r4 V2).
    ws2d_b = jnp.asarray(widen_s2d_kernel(w3), jnp.bfloat16)

    def conv_s2dw(v):  # v: (B, S, S/2, 2C), stays in that layout
        return lax.conv_general_dilated(
            v, ws2d_b, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def prologue_s2dw(v):
        # same GN+adaGN+SiLU chain, stats taken over (H, W', dj, c∈group)
        # which equals the original (H, W, c∈group)
        g = 32
        vg = v.reshape(B, S, S // 2, 2, g, C // g)
        mean = jnp.mean(vg.astype(jnp.float32), axis=(1, 2, 3, 5), keepdims=True)
        var = jnp.var(vg.astype(jnp.float32), axis=(1, 2, 3, 5), keepdims=True)
        n = ((vg - mean) * lax.rsqrt(var + 1e-6)).astype(v.dtype)
        gb = jnp.concatenate([g_b, g_b], axis=1)  # (B, 2C), dj*C+c layout
        bb = jnp.concatenate([b_b, b_b], axis=1)
        n = n.reshape(v.shape) * gb[:, None, None, :] + bb[:, None, None, :]
        return jax.nn.silu(n)

    def conv_s2dw_boxed(v):
        # per-conv wrapping (what a Conv3x3-only model surgery would emit):
        # reshape in, lane-full conv, reshape out — prologue stays in the
        # ORIGINAL layout, so this measures the per-kernel relayout cost
        # that the stage-wide formulation avoids
        y = conv_s2dw(v.reshape(B, S, S // 2, 2 * C))
        return y.reshape(B, S, S, C)

    flops3 = 2 * B * S * S * 9 * C * C * K
    cases = {
        "conv": (lambda v: conv3(v, w3_b), flops3),
        "pair": (lambda v: conv_pair(v, w4_b), flops3),  # useful flops
        "pallas": (lambda v: pair_conv3x3(v, w3_f, bias0), flops3),
        "s2dw": (conv_s2dw, flops3),  # useful flops (dense = 2x)
        "s2dw_box": (conv_s2dw_boxed, flops3),
    }

    x = jnp.asarray(x0, jnp.bfloat16)
    x_s2d = x.reshape(B, S, S // 2, 2 * C)
    results = {}

    if args.full:
        # ------- full-backward suite: d/d(input) AND per-layer d/dW -------
        # The original fwdbwd suite grads the INPUT only (make() line
        # above) — that's how boxed s2d "won" 1.59× in isolation yet
        # REGRESSED the real step (176.9 → 200.4 ms/step): the model also
        # pays the weight-grad correlation, in the widened space under
        # plain AD. This suite chains K convs with K DISTINCT weights and
        # differentiates w.r.t. all of them, prologue always on.
        def prologue_s2dw_lane(v):
            # packed GN stats via lane-aligned [B,2C] reductions (the old
            # prologue_s2dw above reduces a [B,S,W',2,g,cpg] view — the
            # badly-shaped reduce that made the closed chain LOSE in r4's
            # first measurement)
            g = 32
            vf = v.astype(jnp.float32)
            s1 = jnp.mean(vf, axis=(1, 2))
            s2 = jnp.mean(jnp.square(vf), axis=(1, 2))
            s1 = 0.5 * (s1[:, :C] + s1[:, C:])
            s2 = 0.5 * (s2[:, :C] + s2[:, C:])
            mean = s1.reshape(B, g, C // g).mean(-1)
            var = s2.reshape(B, g, C // g).mean(-1) - jnp.square(mean)
            rstd = lax.rsqrt(var + 1e-6)
            a = gamma * jnp.repeat(rstd, C // g, axis=1)
            bb = beta - jnp.repeat(mean, C // g, axis=1) * a
            a2 = jnp.concatenate([a, a], 1).astype(v.dtype)
            b2 = jnp.concatenate([bb, bb], 1).astype(v.dtype)
            return jax.nn.silu(v * a2[:, None, None, :] + b2[:, None, None, :])

        gamma = jnp.asarray((1 + 0.1 * np.random.RandomState(7).randn(B, C)), jnp.float32)
        beta = jnp.asarray(0.1 * np.random.RandomState(8).randn(B, C), jnp.float32)

        def s2dh(v):  # height packing: [B,S,S,C] → [B,S/2,S,2C] (a transpose)
            return v.reshape(B, S // 2, 2, S, C).transpose(0, 1, 3, 2, 4).reshape(B, S // 2, S, 2 * C)

        def un_s2dh(y):
            return y.reshape(B, S // 2, S, 2, C).transpose(0, 1, 3, 2, 4).reshape(B, S, S, C)

        def widen_h(w):
            return widen_s2d_kernel(w.swapaxes(0, 1)).swapaxes(0, 1)

        def loss_conv(v, ws):
            for w in ws:
                v = conv3(prologue(v), w)
            return jnp.sum(v.astype(jnp.float32))

        def loss_s2dw_box(v, ws):
            for w in ws:
                p = prologue(v).reshape(B, S, S // 2, 2 * C)
                v = conv3(p, widen_s2d_kernel(w)).reshape(B, S, S, C)
            return jnp.sum(v.astype(jnp.float32))

        def loss_s2dw_chain(vp, ws):
            for w in ws:
                vp = conv3(prologue_s2dw_lane(vp), widen_s2d_kernel(w))
            return jnp.sum(vp.astype(jnp.float32))

        def loss_s2dh_box(v, ws):
            for w in ws:
                p = s2dh(prologue(v))
                v = un_s2dh(conv3(p, widen_h(w)))
            return jnp.sum(v.astype(jnp.float32))

        ws_list = [
            jnp.asarray((np.random.RandomState(100 + i).randn(3, 3, C, C) * 0.05),
                        jnp.bfloat16)
            for i in range(K)
        ]
        full_cases = {
            "conv": (loss_conv, x),
            "s2dw_box": (loss_s2dw_box, x),
            "s2dw_chain": (loss_s2dw_chain, x_s2d),
            "s2dh_box": (loss_s2dh_box, x),
        }
        for name, (loss, v0) in full_cases.items():
            grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
            dv, _ = grad(v0, ws_list)
            _ = float(dv.reshape(-1)[0].astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                dv, _ = grad(dv, ws_list)  # feed back: no CSE
            _ = float(dv.reshape(-1)[0].astype(jnp.float32))
            dt = (time.perf_counter() - t0) / args.iters
            eff = flops3 * 3  # fwd + input-grad + weight-grad conv-equivalents
            key = f"{name}+pro:fullbwd"
            results[key] = {
                "ms_per_conv": round(dt * 1e3 / K, 3),
                "useful_tflops": round(eff / dt / 1e12, 1),
            }
            print(f"{key:<22} {dt*1e3/K:7.3f} ms/conv-layer   "
                  f"{eff/dt/1e12:6.1f} useful TFLOP/s", flush=True)
        print(json.dumps({"shape": [B, S, S, C], "chain": K,
                          "mode": "fullbwd", "results": results}))
        return

    for name, (fn, fl) in cases.items():
        for pro in (False, True):
            for mode in ("fwd", "fwdbwd"):
                if name == "s2dw":
                    fwd, grad = make(fn, False)
                    if pro:
                        def chain_p(v):
                            for _ in range(K):
                                v = conv_s2dw(prologue_s2dw(v))
                            return v
                        fwd = jax.jit(chain_p)
                        grad = jax.jit(jax.grad(
                            lambda v: jnp.sum(chain_p(v).astype(jnp.float32))))
                    run = fwd if mode == "fwd" else grad
                    out = run(x_s2d)
                else:
                    fwd, grad = make(fn, pro)
                    run = fwd if mode == "fwd" else grad
                    out = run(x)
                _ = float(out.reshape(-1)[0].astype(jnp.float32))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = run(out)  # feed back: no CSE, same shapes
                _ = float(out.reshape(-1)[0].astype(jnp.float32))
                dt = (time.perf_counter() - t0) / args.iters
                eff_fl = fl * (3 if mode == "fwdbwd" else 1)
                key = f"{name}{'+pro' if pro else ''}:{mode}"
                results[key] = {
                    "ms_per_conv": round(dt * 1e3 / K, 3),
                    "useful_tflops": round(eff_fl / dt / 1e12, 1),
                }
                print(f"{key:<18} {dt*1e3/K:7.3f} ms/conv-layer   "
                      f"{eff_fl/dt/1e12:6.1f} useful TFLOP/s", flush=True)
    print(json.dumps({"shape": [B, S, S, C], "chain": K, "results": results}))


if __name__ == "__main__":
    main()
