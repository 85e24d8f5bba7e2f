"""Evaluation tests: Fréchet distance math, stats pipeline, precomputed
stats files, Inception Score math, and the Flax FID-Inception forward."""

import numpy as np
import pytest

from ddgan_tpu.eval import (
    calculate_activation_statistics,
    calculate_fid_given_paths,
    calculate_frechet_distance,
    compute_statistics_of_path,
    inception_score_from_probs,
)
from ddgan_tpu.eval.fid import save_statistics
from ddgan_tpu.eval.inception import InceptionV3FID, random_fid_inception_params
from ddgan_tpu.utils import save_image


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    mu = rng.rand(8)
    a = rng.rand(64, 8)
    sigma = np.cov(a, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_closed_form_diagonal():
    """For diagonal covariances: d² = ||μ1-μ2||² + Σ(√v1 - √v2)²."""
    mu1 = np.array([0.0, 0.0])
    mu2 = np.array([1.0, 2.0])
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 1.0])
    expect = 5.0 + (1 - 3) ** 2 + (2 - 1) ** 2
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert abs(got - expect) < 1e-6


def test_stats_pipeline_and_npz(tmp_path):
    rng = np.random.RandomState(0)

    def feature_fn(batch):  # fake 16-dim extractor
        return batch.reshape(batch.shape[0], -1)[:, :16]

    imgs = [rng.rand(4, 4, 3).astype(np.float32) for _ in range(20)]
    mu, sigma = calculate_activation_statistics(imgs, feature_fn, batch_size=7, dims=16)
    assert mu.shape == (16,) and sigma.shape == (16, 16)

    save_statistics(str(tmp_path / "stats.npz"), mu, sigma)
    mu2, sigma2 = compute_statistics_of_path(str(tmp_path / "stats.npz"), feature_fn)
    np.testing.assert_allclose(mu, mu2)
    np.testing.assert_allclose(sigma, sigma2)


def test_fid_between_image_dirs(tmp_path):
    rng = np.random.RandomState(0)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    for i in range(8):
        save_image(rng.rand(8, 8, 3), d1 / f"{i}.png")
        save_image(rng.rand(8, 8, 3) * 0.5, d2 / f"{i}.png")

    def feature_fn(batch):
        return batch.reshape(batch.shape[0], -1)[:, :4]

    fid_same = calculate_fid_given_paths(
        [str(d1), str(d1)], batch_size=4, dims=4, feature_fn=feature_fn
    )
    fid_diff = calculate_fid_given_paths(
        [str(d1), str(d2)], batch_size=4, dims=4, feature_fn=feature_fn
    )
    assert fid_same < 1e-6
    assert fid_diff > fid_same


def test_inception_score_bounds():
    n, c = 100, 10
    uniform = np.full((n, c), 1.0 / c)
    mean, std = inception_score_from_probs(uniform, splits=2)
    assert abs(mean - 1.0) < 1e-6
    one_hot = np.eye(c)[np.arange(n) % c] * (1 - 1e-9) + 1e-10
    mean_oh, _ = inception_score_from_probs(one_hot, splits=1)
    assert abs(mean_oh - c) < 0.5


def test_random_feature_space_discriminates(tmp_path, monkeypatch):
    """Zero-egress fallback (DDGAN_TPU_INCEPTION_RANDOM): the He-init
    random feature space must separate distributions — FID(real-ish vs
    same dist) << FID(real-ish vs noise). Guards against the r2 bug where
    1/sqrt(fan_in) init collapsed deep activations to ~1e-9 and every FID
    degenerated to ~0 (tools/quality_e2e.py relies on this signal)."""
    from ddgan_tpu.eval.inception import default_feature_fn

    monkeypatch.setenv("DDGAN_TPU_INCEPTION_RANDOM", "0")
    monkeypatch.delenv("DDGAN_TPU_INCEPTION_PATH", raising=False)
    feature_fn = default_feature_fn(dims=2048)

    rng = np.random.RandomState(0)

    def blobs(n, shift=0.0):
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
        out = []
        for _ in range(n):
            cy, cx = rng.uniform(0.3, 0.7, size=2)
            img = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.02))
            out.append(np.clip(np.stack([img] * 3, -1) + shift, 0, 1))
        return np.stack(out)

    a, b = blobs(24), blobs(24)
    noise = rng.rand(24, 32, 32, 3).astype(np.float32)
    fa = feature_fn(a)
    assert np.isfinite(fa).all() and fa.std() > 1e-3  # features carry signal
    mu_a, s_a = fa.mean(0), np.cov(fa, rowvar=False)
    fb = feature_fn(b)
    fn_ = feature_fn(noise)
    same = calculate_frechet_distance(mu_a, s_a, fb.mean(0), np.cov(fb, rowvar=False))
    diff = calculate_frechet_distance(mu_a, s_a, fn_.mean(0), np.cov(fn_, rowvar=False))
    assert diff > 5.0 * same, (same, diff)


def test_fid_inception_forward_shapes():
    """Random-weight FID Inception: correct feature dims per block."""
    params = random_fid_inception_params()
    model = InceptionV3FID(params, output_blocks=(0, 1, 2, 3), resize_input=False)
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).rand(2, 75, 75, 3).astype(np.float32))
    outs = model(x)
    assert outs[0].shape[-1] == 64
    assert outs[1].shape[-1] == 192
    assert outs[2].shape[-1] == 768
    assert outs[3].shape == (2, 1, 1, 2048)
    feats = model.pool_features(x)
    assert feats.shape == (2, 2048)


def test_is_cli_load_sample_array(tmp_path):
    """CLI input variants (ref inception_score.py:93-103 loads one .npy
    stack; our test_ddgan --save_npy writes per-image (3,H,W) [0,1] files)."""
    from ddgan_tpu.eval.inception_score import load_sample_array

    rng = np.random.RandomState(0)
    # single stack, NCHW, [0,255]
    stack = rng.uniform(0, 255, (5, 3, 8, 8)).astype(np.float32)
    np.save(tmp_path / "stack.npy", stack)
    got = load_sample_array(str(tmp_path / "stack.npy"))
    assert got.shape == (5, 8, 8, 3)
    np.testing.assert_allclose(got, stack.transpose(0, 2, 3, 1))

    # directory of per-image CHW files in [0,1] → rescaled to [0,255]
    d = tmp_path / "samples"
    d.mkdir()
    imgs = rng.rand(12, 3, 8, 8).astype(np.float32)
    for i, im in enumerate(imgs):
        np.save(d / f"{i}.npy", im)
    got = load_sample_array(str(d))
    assert got.shape == (12, 8, 8, 3)
    np.testing.assert_allclose(
        got, imgs.transpose(0, 2, 3, 1) * 255.0, rtol=1e-6
    )


def test_inception_score_cli_random_space(tmp_path, monkeypatch, capsys):
    """End-to-end IS CLI over a saved .npy stack with the zero-egress
    random classifier (ref inception_score.py:93-103 protocol)."""
    from ddgan_tpu.eval import inception_score

    monkeypatch.setenv("DDGAN_TPU_INCEPTION_RANDOM", "0")
    monkeypatch.delenv("DDGAN_TPU_INCEPTION_PATH", raising=False)
    rng = np.random.RandomState(1)
    stack = rng.uniform(0, 255, (4, 3, 16, 16)).astype(np.float32)
    np.save(tmp_path / "samples.npy", stack)

    m, s = inception_score.main(
        ["--sample_dir", str(tmp_path / "samples.npy"), "--splits", "2",
         "--batch_size", "2"]
    )
    out = capsys.readouterr().out
    assert "mean: " in out and "std: " in out
    assert np.isfinite(m) and np.isfinite(s) and m >= 1.0
