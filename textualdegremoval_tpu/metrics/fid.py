"""FID (Frechet Inception Distance) — statistics math + pluggable feature
extractor.

The reference's FID is dead code (imports a missing InceptionV3 module,
SURVEY.md §2.5.9).  Here the Frechet distance itself is implemented and
tested; the feature extractor is injected (any callable images -> (N, D)
features — e.g. a Flax InceptionV3 or a CLIP tower), so FID actually runs.
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
