"""Mixup augmentation (reference Mixing_Augment,
models/image_restoration_ref_model.py — lam ~ Beta(beta, beta) convex mix of
shuffled pairs, optional identity passthrough)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixing_augment(rng, target, input_, mixup_beta: float = 1.2,
                   use_identity: bool = True):
    """Returns (rng', target', input')."""
    rng, k_lam, k_perm, k_id = jax.random.split(rng, 4)
    b = target.shape[0]
    lam = jax.random.beta(k_lam, mixup_beta, mixup_beta)
    perm = jax.random.permutation(k_perm, b)
    t_mix = lam * target + (1 - lam) * target[perm]
    i_mix = lam * input_ + (1 - lam) * input_[perm]
    if use_identity:
        # one extra arm: with prob 1/(n_augs+1) keep the originals
        keep = jax.random.randint(k_id, (), 0, 2) == 0
        t_mix = jnp.where(keep, target, t_mix)
        i_mix = jnp.where(keep, input_, i_mix)
    return rng, t_mix, i_mix
