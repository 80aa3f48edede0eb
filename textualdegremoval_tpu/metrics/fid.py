"""FID (Frechet Inception Distance) — statistics math + InceptionV3 pool3
feature extraction.

The reference's FID is dead code (imports a missing InceptionV3 module,
SURVEY.md §2.5.9).  Here both halves work: the Frechet distance math below,
and a Flax InceptionV3 pool3 extractor (metrics/inception.py) used by
`calculate_fid_from_images`.  A different extractor (e.g. a CLIP tower) can
be substituted by computing features directly and calling `calculate_fid`.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def compute_statistics(features: np.ndarray):
    """(N, D) activations -> (mu, sigma)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_fid(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = compute_statistics(feats_a)
    mu2, s2 = compute_statistics(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


def calculate_fid_from_images(images_a, images_b, variables=None,
                              weights_path: str | None = None,
                              batch_size: int = 32) -> float:
    """FID between two image sets (NHWC RGB in [0, 1]) using the Flax
    InceptionV3 pool3 extractor.

    `variables` (a Flax tree) or `weights_path` (a torch InceptionV3 state
    dict, torchvision/pytorch-fid naming) select the weights; without either
    the net is seed-0 random-init — the pipeline runs everywhere, but scores
    are only comparable across runs sharing the same weights.
    """
    import jax
    import jax.numpy as jnp

    from textualdegremoval_tpu.metrics.inception import (
        InceptionV3, extract_features, load_torch_inception)

    if variables is None:
        if weights_path is not None:
            variables = load_torch_inception(weights_path)
        else:
            variables = InceptionV3().init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    fa = np.asarray(extract_features(variables, jnp.asarray(images_a),
                                     batch_size))
    fb = np.asarray(extract_features(variables, jnp.asarray(images_b),
                                     batch_size))
    return calculate_fid(fa, fb)
