"""Inception Score: exp(E_x KL(p(y|x) || p(y))) over splits.

Reference: pytorch_fid/inception_score.py:44-90 (TF1/tfgan based there;
the math is identical). The classifier is pluggable — any
`logits_fn(batch) -> (B, num_classes)`; with the FID InceptionV3 weights
present this can be its logits head, otherwise tests feed synthetic
probabilities.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def inception_score_from_probs(
    probs: np.ndarray, splits: int = 1
) -> tuple[float, float]:
    """IS from softmax probabilities (N, C). Returns (mean, std) over splits.

    Per split s: exp( mean_i KL(p(y|x_i) || mean_j p(y|x_j)) ).
    (inception_score.py:64-82)
    """
    probs = np.asarray(probs, dtype=np.float64)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def get_inception_score(
    images: Sequence[np.ndarray],
    logits_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 50,
    splits: int = 10,
) -> tuple[float, float]:
    """IS over images in [0,1] NHWC using a pluggable classifier.
    (inception_score.py:80-90 protocol: batches → softmax → split KL.)"""
    all_probs = []
    for i in range(0, len(images), batch_size):
        batch = np.stack([np.asarray(im, np.float32) for im in images[i : i + batch_size]])
        logits = np.asarray(logits_fn(batch))
        logits = logits - logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        all_probs.append(e / e.sum(axis=1, keepdims=True))
    return inception_score_from_probs(np.concatenate(all_probs), splits=splits)
