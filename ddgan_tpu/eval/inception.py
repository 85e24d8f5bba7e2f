"""FID InceptionV3 as pure JAX inference (NHWC).

Port of the TF-FID Inception variant (reference: pytorch_fid/inception.py —
torchvision InceptionV3 with the FID-patched pooling blocks FIDInceptionA/
C/E_1/E_2, inception.py:220-337): all in-block avg-pools use
count_include_pad=False, and Mixed_7c (FIDInceptionE_2) keeps a stride-1
MAX pool in its pool branch — the TF-FID checkpoint's quirk that the
patch deliberately preserves (inception.py:330-337).

Weights: the standard `pt_inception-2015-12-05-6726825d.pth` state_dict
imported via `load_fid_inception_params` (zero-egress: the file must exist
locally — set DDGAN_TPU_INCEPTION_PATH or pass a path). Random
correctly-shaped params are available for pipeline tests.

Because this network is inference-only, it is implemented as pure
functions over a flat dict keyed by the TORCH parameter names (conv
weights pre-transposed to HWIO) — no flax Module/init ceremony, and the
whole feature extractor jits into one XLA program.

Input protocol (inception.py:140-162): NHWC float in [0,1]; optional
bilinear resize to 299 (align_corners=False); then x*2-1.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# dims → block index, as in pytorch_fid (fid_score uses 2048 by default)
BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}

DEFAULT_WEIGHTS_ENV = "DDGAN_TPU_INCEPTION_PATH"


# --------------------------------------------------------------------------
# pooling helpers
def _max_pool(x, window=3, stride=2, padding="VALID"):
    if isinstance(padding, int):  # torch-style symmetric pad (pads with -inf)
        p = padding
        padding = ((0, 0), (p, p), (p, p), (0, 0))
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1), padding
    )


def _avg_pool(x, window=3, stride=1, pad=1, count_include_pad=True):
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    if count_include_pad:
        return summed / float(window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    return summed / counts


def _conv_bn_relu(params, prefix, x, stride=1, padding=((0, 0), (0, 0))):
    w = params[prefix + ".conv.weight"]  # HWIO
    x = lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    gamma = params[prefix + ".bn.weight"]
    beta = params[prefix + ".bn.bias"]
    mean = params[prefix + ".bn.running_mean"]
    var = params[prefix + ".bn.running_var"]
    inv = gamma * lax.rsqrt(var + 1e-3)  # torch BatchNorm eps=0.001
    x = x * inv + (beta - mean * inv)
    return jax.nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return (p[0], p[1]) if isinstance(p[0], tuple) else ((p[0], p[0]), (p[1], p[1]))


# --------------------------------------------------------------------------
# inception blocks (structure: torchvision inception_v3; FID pool patches)
def _inception_a(params, prefix, x):
    c = partial(_conv_bn_relu, params)
    b1 = c(prefix + ".branch1x1", x)
    b5 = c(prefix + ".branch5x5_1", x)
    b5 = c(prefix + ".branch5x5_2", b5, padding=_pad(2))
    b3 = c(prefix + ".branch3x3dbl_1", x)
    b3 = c(prefix + ".branch3x3dbl_2", b3, padding=_pad(1))
    b3 = c(prefix + ".branch3x3dbl_3", b3, padding=_pad(1))
    bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)  # FID patch (inception.py:232)
    bp = c(prefix + ".branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, prefix, x):
    c = partial(_conv_bn_relu, params)
    b3 = c(prefix + ".branch3x3", x, stride=2)
    bd = c(prefix + ".branch3x3dbl_1", x)
    bd = c(prefix + ".branch3x3dbl_2", bd, padding=_pad(1))
    bd = c(prefix + ".branch3x3dbl_3", bd, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, prefix, x):
    c = partial(_conv_bn_relu, params)
    b1 = c(prefix + ".branch1x1", x)
    b7 = c(prefix + ".branch7x7_1", x)
    b7 = c(prefix + ".branch7x7_2", b7, padding=((0, 0), (3, 3)))
    b7 = c(prefix + ".branch7x7_3", b7, padding=((3, 3), (0, 0)))
    bd = c(prefix + ".branch7x7dbl_1", x)
    bd = c(prefix + ".branch7x7dbl_2", bd, padding=((3, 3), (0, 0)))
    bd = c(prefix + ".branch7x7dbl_3", bd, padding=((0, 0), (3, 3)))
    bd = c(prefix + ".branch7x7dbl_4", bd, padding=((3, 3), (0, 0)))
    bd = c(prefix + ".branch7x7dbl_5", bd, padding=((0, 0), (3, 3)))
    bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)  # FID patch (inception.py:259)
    bp = c(prefix + ".branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, prefix, x):
    c = partial(_conv_bn_relu, params)
    b3 = c(prefix + ".branch3x3_1", x)
    b3 = c(prefix + ".branch3x3_2", b3, stride=2)
    b7 = c(prefix + ".branch7x7x3_1", x)
    b7 = c(prefix + ".branch7x7x3_2", b7, padding=((0, 0), (3, 3)))
    b7 = c(prefix + ".branch7x7x3_3", b7, padding=((3, 3), (0, 0)))
    b7 = c(prefix + ".branch7x7x3_4", b7, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, prefix, x, pool: str):
    c = partial(_conv_bn_relu, params)
    b1 = c(prefix + ".branch1x1", x)
    b3 = c(prefix + ".branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            c(prefix + ".branch3x3_2a", b3, padding=((0, 0), (1, 1))),
            c(prefix + ".branch3x3_2b", b3, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    bd = c(prefix + ".branch3x3dbl_1", x)
    bd = c(prefix + ".branch3x3dbl_2", bd, padding=_pad(1))
    bd = jnp.concatenate(
        [
            c(prefix + ".branch3x3dbl_3a", bd, padding=((0, 0), (1, 1))),
            c(prefix + ".branch3x3dbl_3b", bd, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    if pool == "avg_nopad":  # FIDInceptionE_1 (inception.py:281-309)
        bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)
    elif pool == "max":  # FIDInceptionE_2 KEEPS the stride-1 max pool —
        # the TF-FID checkpoint's quirk, preserved by the patch
        # (inception.py:330-337)
        bp = _max_pool(x, 3, 1, padding=1)
    else:
        raise ValueError(f"unknown pool mode {pool!r}")
    bp = c(prefix + ".branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _resize_bilinear_299(x):
    """F.interpolate(size=(299,299), mode='bilinear', align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")


class InceptionV3FID:
    """Feature extractor over the 4 FID blocks (64/192/768/2048 dims)."""

    def __init__(
        self,
        params: dict[str, np.ndarray],
        output_blocks: Sequence[int] = (3,),
        resize_input: bool = True,
        normalize_input: bool = True,
    ):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.output_blocks = tuple(sorted(output_blocks))
        self.last_needed_block = max(self.output_blocks)
        self.resize_input = resize_input
        self.normalize_input = normalize_input

    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: NHWC float in [0,1] → list of NHWC feature maps."""
        p = self.params
        outputs = []
        if self.resize_input:
            x = _resize_bilinear_299(x)
        if self.normalize_input:
            x = 2 * x - 1  # (inception.py:160-162)

        c = partial(_conv_bn_relu, p)
        # Block 0: stem → maxpool1 (64 ch)
        x = c("Conv2d_1a_3x3", x, stride=2)
        x = c("Conv2d_2a_3x3", x)
        x = c("Conv2d_2b_3x3", x, padding=_pad(1))
        x = _max_pool(x, 3, 2)
        if 0 in self.output_blocks:
            outputs.append(x)
        if self.last_needed_block >= 1:
            # Block 1 → maxpool2 (192 ch)
            x = c("Conv2d_3b_1x1", x)
            x = c("Conv2d_4a_3x3", x)
            x = _max_pool(x, 3, 2)
            if 1 in self.output_blocks:
                outputs.append(x)
        if self.last_needed_block >= 2:
            x = _inception_a(p, "Mixed_5b", x)
            x = _inception_a(p, "Mixed_5c", x)
            x = _inception_a(p, "Mixed_5d", x)
            x = _inception_b(p, "Mixed_6a", x)
            x = _inception_c(p, "Mixed_6b", x)
            x = _inception_c(p, "Mixed_6c", x)
            x = _inception_c(p, "Mixed_6d", x)
            x = _inception_c(p, "Mixed_6e", x)
            if 2 in self.output_blocks:
                outputs.append(x)
        if self.last_needed_block >= 3:
            x = _inception_d(p, "Mixed_7a", x)
            x = _inception_e(p, "Mixed_7b", x, pool="avg_nopad")
            x = _inception_e(p, "Mixed_7c", x, pool="max")
            x = x.mean(axis=(1, 2), keepdims=True)  # adaptive_avg_pool to 1x1
            if 3 in self.output_blocks:
                outputs.append(x)
        return outputs

    def pool_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, dims) features of the highest requested block."""
        out = self(x)[-1]
        if out.ndim == 4:
            out = out.mean(axis=(1, 2)) if out.shape[1] > 1 else out[:, 0, 0, :]
        return out


# --------------------------------------------------------------------------
# weights
def params_from_torch_state_dict(sd, keep_fc: bool = False) -> dict[str, np.ndarray]:
    """Convert a fid_inception_v3-shaped torch state_dict (OIHW convs) to the
    flat HWIO param dict this module consumes. AuxLogits and BN bookkeeping
    are always dropped; fc.* kept only when keep_fc (Inception Score head)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("AuxLogits.") or k.endswith("num_batches_tracked"):
            continue
        if k.startswith("fc.") and not keep_fc:
            continue
        arr = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        if k.endswith(".conv.weight"):
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
        out[k] = arr.astype(np.float32)
    return out


def load_fid_inception_params(path: str | None = None) -> dict[str, np.ndarray]:
    """Import pt_inception-2015-12-05 torch weights → HWIO param dict.

    The classifier head (fc.*) and aux branch are dropped — FID uses pool3.
    """
    path = path or os.environ.get(DEFAULT_WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "FID Inception weights not found. Download "
            "pt_inception-2015-12-05-6726825d.pth (reference inception.py:22) "
            f"and point {DEFAULT_WEIGHTS_ENV} at it (no auto-download here)."
        )
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return params_from_torch_state_dict(sd, keep_fc=False)


def random_fid_inception_params(seed: int = 0) -> dict[str, np.ndarray]:
    """Correctly-shaped random params (pipeline tests without real weights).

    He-initialized (std = sqrt(2/fan_in)): with the BN running stats fixed
    at (0, 1), conservative 1/sqrt(fan_in) scaling decays activation
    variance ~0.8x per ReLU layer — after the 94-conv trunk the pool3
    features collapse to ~1e-9 and carry no image information (every FID
    degenerates to ~0). He scaling keeps variance O(1) through ReLU, so
    the random-feature space actually discriminates distributions.
    """
    rng = np.random.RandomState(seed)
    params: dict[str, np.ndarray] = {}

    def conv(prefix, cin, cout, kh, kw):
        params[prefix + ".conv.weight"] = (
            rng.randn(kh, kw, cin, cout).astype(np.float32)
            * np.sqrt(2.0 / (cin * kh * kw))
        )
        params[prefix + ".bn.weight"] = np.ones(cout, np.float32)
        params[prefix + ".bn.bias"] = np.zeros(cout, np.float32)
        params[prefix + ".bn.running_mean"] = np.zeros(cout, np.float32)
        params[prefix + ".bn.running_var"] = np.ones(cout, np.float32)

    conv("Conv2d_1a_3x3", 3, 32, 3, 3)
    conv("Conv2d_2a_3x3", 32, 32, 3, 3)
    conv("Conv2d_2b_3x3", 32, 64, 3, 3)
    conv("Conv2d_3b_1x1", 64, 80, 1, 1)
    conv("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(prefix, cin, pool):
        conv(prefix + ".branch1x1", cin, 64, 1, 1)
        conv(prefix + ".branch5x5_1", cin, 48, 1, 1)
        conv(prefix + ".branch5x5_2", 48, 64, 5, 5)
        conv(prefix + ".branch3x3dbl_1", cin, 64, 1, 1)
        conv(prefix + ".branch3x3dbl_2", 64, 96, 3, 3)
        conv(prefix + ".branch3x3dbl_3", 96, 96, 3, 3)
        conv(prefix + ".branch_pool", cin, pool, 1, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)

    conv("Mixed_6a.branch3x3", 288, 384, 3, 3)
    conv("Mixed_6a.branch3x3dbl_1", 288, 64, 1, 1)
    conv("Mixed_6a.branch3x3dbl_2", 64, 96, 3, 3)
    conv("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def block_c(prefix, c7):
        conv(prefix + ".branch1x1", 768, 192, 1, 1)
        conv(prefix + ".branch7x7_1", 768, c7, 1, 1)
        conv(prefix + ".branch7x7_2", c7, c7, 1, 7)
        conv(prefix + ".branch7x7_3", c7, 192, 7, 1)
        conv(prefix + ".branch7x7dbl_1", 768, c7, 1, 1)
        conv(prefix + ".branch7x7dbl_2", c7, c7, 7, 1)
        conv(prefix + ".branch7x7dbl_3", c7, c7, 1, 7)
        conv(prefix + ".branch7x7dbl_4", c7, c7, 7, 1)
        conv(prefix + ".branch7x7dbl_5", c7, 192, 1, 7)
        conv(prefix + ".branch_pool", 768, 192, 1, 1)

    block_c("Mixed_6b", 128)
    block_c("Mixed_6c", 160)
    block_c("Mixed_6d", 160)
    block_c("Mixed_6e", 192)

    conv("Mixed_7a.branch3x3_1", 768, 192, 1, 1)
    conv("Mixed_7a.branch3x3_2", 192, 320, 3, 3)
    conv("Mixed_7a.branch7x7x3_1", 768, 192, 1, 1)
    conv("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    conv("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    conv("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def block_e(prefix, cin):
        conv(prefix + ".branch1x1", cin, 320, 1, 1)
        conv(prefix + ".branch3x3_1", cin, 384, 1, 1)
        conv(prefix + ".branch3x3_2a", 384, 384, 1, 3)
        conv(prefix + ".branch3x3_2b", 384, 384, 3, 1)
        conv(prefix + ".branch3x3dbl_1", cin, 448, 1, 1)
        conv(prefix + ".branch3x3dbl_2", 448, 384, 3, 3)
        conv(prefix + ".branch3x3dbl_3a", 384, 384, 1, 3)
        conv(prefix + ".branch3x3dbl_3b", 384, 384, 3, 1)
        conv(prefix + ".branch_pool", cin, 192, 1, 1)

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return params


RANDOM_WEIGHTS_ENV = "DDGAN_TPU_INCEPTION_RANDOM"


def default_feature_fn(dims: int = 2048, weights_path: str | None = None):
    """Jitted (B,H,W,C)∈[0,1] → (B, dims) feature function for FID.

    Zero-egress fallback: if the pretrained checkpoint is unavailable,
    setting DDGAN_TPU_INCEPTION_RANDOM=<seed> uses seeded random Inception
    weights instead. The resulting "FID" is the Fréchet distance in a fixed
    random-feature space — self-consistent across runs with the same seed
    (valid for trend/ablation comparisons) but NOT comparable to published
    FID numbers; a loud warning is printed.
    """
    block = BLOCK_INDEX_BY_DIM[dims]
    rand_seed = os.environ.get(RANDOM_WEIGHTS_ENV)
    if rand_seed is not None and (weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)):
        # Both sources configured: the real-weights path wins. Say so loudly
        # so quality tooling can never mislabel a feature space (a stale
        # inherited RANDOM var with a real PATH — or vice versa — would
        # otherwise silently change what the scores mean).
        print(
            f"NOTE: both {RANDOM_WEIGHTS_ENV} and a weights path are set; "
            f"using REAL weights from "
            f"{weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)} and "
            f"ignoring {RANDOM_WEIGHTS_ENV}={rand_seed}."
        )
    if rand_seed is not None and not (
        weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)
    ):
        print(
            "WARNING: using RANDOM Inception weights "
            f"({RANDOM_WEIGHTS_ENV}={rand_seed}); scores are random-feature "
            "Fréchet distances, not comparable to published FID."
        )
        params = random_fid_inception_params(int(rand_seed))
    else:
        params = load_fid_inception_params(weights_path)
    model = InceptionV3FID(params, output_blocks=(block,))
    fn = jax.jit(lambda x: model.pool_features(x))

    def feature_fn(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(batch)))

    return feature_fn


# --------------------------------------------------------------------------
# classifier head (Inception Score). FID drops fc; IS needs it.
def load_fid_inception_logits_params(path: str | None = None) -> dict[str, np.ndarray]:
    """Like load_fid_inception_params but keeps the 1008-way fc head
    (the TF-FID checkpoint's classifier, used for Inception Score)."""
    path = path or os.environ.get(DEFAULT_WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            f"FID Inception weights not found (set {DEFAULT_WEIGHTS_ENV})."
        )
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return params_from_torch_state_dict(sd, keep_fc=True)


def random_fid_inception_logits_params(seed: int = 0) -> dict[str, np.ndarray]:
    """random_fid_inception_params + a random 1008-way fc head (the TF-FID
    checkpoint's classifier width), for IS pipeline runs without weights."""
    params = random_fid_inception_params(seed)
    rng = np.random.RandomState(seed + 1)
    params["fc.weight"] = (
        rng.randn(1008, 2048).astype(np.float32) * np.sqrt(1.0 / 2048)
    )
    params["fc.bias"] = np.zeros(1008, np.float32)
    return params


def default_logits_fn(weights_path: str | None = None):
    """Jitted (B,H,W,C)∈[0,1] → (B, classes) logits for Inception Score.

    Same zero-egress fallback as default_feature_fn: with no real weights
    and DDGAN_TPU_INCEPTION_RANDOM=<seed> set, a seeded-random classifier is
    used (scores are NOT comparable to published IS; loud warning printed).
    """
    rand_seed = os.environ.get(RANDOM_WEIGHTS_ENV)
    if rand_seed is not None and (weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)):
        # same loud conflict announcement as default_feature_fn: the
        # real-weights path wins, and the score labeling must never be
        # silently wrong.
        print(
            f"NOTE: both {RANDOM_WEIGHTS_ENV} and a weights path are set; "
            f"using REAL weights from "
            f"{weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)} and "
            f"ignoring {RANDOM_WEIGHTS_ENV}={rand_seed}."
        )
    if rand_seed is not None and not (
        weights_path or os.environ.get(DEFAULT_WEIGHTS_ENV)
    ):
        print(
            "WARNING: using RANDOM Inception classifier "
            f"({RANDOM_WEIGHTS_ENV}={rand_seed}); Inception Scores are in a "
            "random-logit space, not comparable to published IS."
        )
        params = random_fid_inception_logits_params(int(rand_seed))
    else:
        params = load_fid_inception_logits_params(weights_path)
    fc_w = jnp.asarray(params.pop("fc.weight"))  # (classes, 2048)
    fc_b = jnp.asarray(params.pop("fc.bias"))
    model = InceptionV3FID(params, output_blocks=(3,))

    @jax.jit
    def logits(x):
        feats = model.pool_features(x)
        return feats @ fc_w.T + fc_b

    def logits_fn(batch: np.ndarray) -> np.ndarray:
        return np.asarray(logits(jnp.asarray(batch)))

    return logits_fn
