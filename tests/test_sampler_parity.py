"""End-to-end sampler parity: our T-step reverse sampler over a
weight-imported generator must reproduce the reference sampler given
identical injected noise (SURVEY.md §7 hard-part 2 / BASELINE.md
"bit-comparable sampler outputs given identical injected noise").

The torch side runs the REFERENCE functions (test_ddgan.py's
Posterior_Coefficients + sample_posterior + the T-step loop) over the
reference NCSNpp; ours runs the jitted lax.scan-equivalent loop with the
same noise sequence fed in.
"""

import argparse

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ddgan_tpu.compat import convert_torch_state_dict
from ddgan_tpu.diffusion import (
    PosteriorCoefficients,
    sample_posterior_with_noise,
)
from ddgan_tpu.models import NCSNpp

from torch_ref import install_reference
from test_model_parity import tiny_gen_args

install_reference()

from score_sde.models.ncsnpp_generator_adagn import NCSNpp as TorchNCSNpp  # noqa: E402
import test_ddgan as ref_test  # noqa: E402  (reference module, read-only oracle)


def test_sampler_parity_t4():
    args = tiny_gen_args(num_timesteps=4, beta_min=0.1, beta_max=20.0,
                         use_geometric=False)
    torch.manual_seed(0)
    tm = TorchNCSNpp(args)
    tm.eval()

    fm = NCSNpp.from_config(args)
    k = jax.random.PRNGKey(0)
    b, T, nz = 2, 4, args.nz
    size = args.image_size

    template = fm.init(
        {"params": k, "dropout": k},
        jnp.zeros((b, size, size, 3)), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, nz)),
    )
    params, buffers = convert_torch_state_dict(
        tm.state_dict(), template["params"], template.get("buffers")
    )
    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers

    rng = np.random.RandomState(5)
    x_init = rng.randn(b, 3, size, size).astype(np.float32)
    zs = [rng.randn(b, nz).astype(np.float32) for _ in range(T)]
    posts = [rng.randn(b, 3, size, size).astype(np.float32) for _ in range(T)]

    # ---- reference side: torch coefficients + posterior + loop
    dev = torch.device("cpu")
    ref_args = argparse.Namespace(**vars(args))
    pos_t = ref_test.Posterior_Coefficients(ref_args, dev)
    x_t = torch.from_numpy(x_init)
    with torch.no_grad():
        for step, i in enumerate(reversed(range(T))):
            t = torch.full((b,), i, dtype=torch.int64)
            x0 = tm(x_t, t, torch.from_numpy(zs[step]))
            # reference sample_posterior draws noise internally; re-derive
            # its mean/var path with our injected noise
            mean = (
                ref_test.extract(pos_t.posterior_mean_coef1, t, x_t.shape) * x0
                + ref_test.extract(pos_t.posterior_mean_coef2, t, x_t.shape) * x_t
            )
            log_var = ref_test.extract(
                pos_t.posterior_log_variance_clipped, t, x_t.shape
            )
            nonzero = (1 - (t == 0).float()).view(-1, 1, 1, 1)
            x_t = mean + nonzero * torch.exp(0.5 * log_var) * torch.from_numpy(
                posts[step]
            )
    ref_out = x_t.numpy()

    # ---- ours: jitted generator + posterior with the same noise
    pos_j = PosteriorCoefficients.create(T, args.beta_min, args.beta_max)
    gen_apply = jax.jit(lambda x, t, z: fm.apply(variables, x, t, z, train=False))
    x = jnp.asarray(x_init.transpose(0, 2, 3, 1))
    for step, i in enumerate(reversed(range(T))):
        t = jnp.full((b,), i, jnp.int32)
        x0 = gen_apply(x, t, jnp.asarray(zs[step]))
        x = sample_posterior_with_noise(
            pos_j, x0, x, t, jnp.asarray(posts[step].transpose(0, 2, 3, 1))
        )
    ours = np.asarray(x).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=5e-5)


def test_sharded_sampler_matches_per_device_runs():
    """Mesh-sharded generation (make_sharded_sampler, the test_ddgan FID
    path): shard i's output must equal a single-device sample_from_model
    run with fold_in(key, i) — i.e. sharding changes the work
    distribution, never the samples. Tolerance is ~1 ulp rather than
    bit-exact: the shard_map-wrapped and standalone programs are compiled
    separately and XLA may fuse/round float chains differently (observed
    1.5e-8 on one element after the T<=16 sampler unroll)."""
    from ddgan_tpu.diffusion import (
        make_sharded_sampler,
        sample_from_model,
    )
    from ddgan_tpu.parallel import make_mesh

    pos = PosteriorCoefficients.create(4, 0.1, 20.0)
    nz, hw, c, per_dev = 4, 8, 1, 2

    def toy_generator(x, t, z):
        # cheap stand-in with real (x, t, z) dependence
        return jnp.tanh(x * 0.5 + z.mean(axis=1).reshape(-1, 1, 1, 1)
                        - 0.01 * t.astype(x.dtype).reshape(-1, 1, 1, 1))

    mesh = make_mesh()
    n_dev = mesh.size
    sampler = make_sharded_sampler(
        pos, toy_generator, 4, (hw, hw, c), nz, mesh, per_device_batch=per_dev
    )
    key = jax.random.PRNGKey(123)
    out = np.asarray(sampler(key))
    assert out.shape == (per_dev * n_dev, hw, hw, c)
    assert np.isfinite(out).all()

    for i in range(n_dev):
        ki = jax.random.fold_in(key, i)
        kx, ks = jax.random.split(ki)
        x_init = jax.random.normal(kx, (per_dev, hw, hw, c))
        ref = np.asarray(
            sample_from_model(pos, toy_generator, 4, x_init, ks, nz)
        )
        np.testing.assert_allclose(
            out[i * per_dev:(i + 1) * per_dev], ref, rtol=0, atol=1e-6
        )
