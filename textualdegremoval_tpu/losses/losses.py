"""Restoration losses (NHWC), parity with reference losses/losses.py:11-122.

All functions are jit-friendly pure functions; `build_loss` resolves the
reference YAML `pixel_opt: {type, loss_weight, reduction}` surface
(image_restoration_ref_model.py:129-135 getattr-based registry).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp

# BT.601 RGB->Y coefficients (reference PSNRLoss toY path, losses.py:94)
# plain tuple, converted at trace time: a module-level jnp.asarray would
# initialize the XLA backend at import, which breaks
# jax.distributed.initialize in multi-host CLIs (must run before any
# backend-initializing JAX call)
_Y_COEF = (65.481, 128.553, 24.966)


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def l1_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    return loss_weight * _reduce(loss, reduction)


def mse_loss(pred, target, weight=None, loss_weight=1.0, reduction="mean"):
    loss = jnp.square(pred - target)
    if weight is not None:
        loss = loss * weight
    return loss_weight * _reduce(loss, reduction)


def psnr_loss(pred, target, loss_weight=1.0, to_y=False, reduction="mean"):
    """10/ln(10) * mean_b[log(mse_b + 1e-8)] — minimizing maximizes PSNR.

    pred/target in [0,1], NHWC."""
    assert reduction == "mean"
    if to_y:
        coef = jnp.asarray(_Y_COEF, pred.dtype)
        pred = (pred * coef).sum(-1, keepdims=True) + 16.0
        target = (target * coef).sum(-1, keepdims=True) + 16.0
        pred, target = pred / 255.0, target / 255.0
    scale = 10.0 / math.log(10.0)
    per_img = jnp.log(jnp.mean(jnp.square(pred - target), axis=(1, 2, 3)) + 1e-8)
    return loss_weight * scale * jnp.mean(per_img)


def charbonnier_loss(pred, target, loss_weight=1.0, eps=1e-3, reduction="mean"):
    diff = pred - target
    return loss_weight * jnp.mean(jnp.sqrt(diff * diff + eps * eps))


_LOSSES = {
    "L1Loss": l1_loss,
    "MSELoss": mse_loss,
    "PSNRLoss": psnr_loss,
    "CharbonnierLoss": charbonnier_loss,
}


def build_loss(opt: dict):
    """Resolve a reference-style loss config dict into a callable."""
    opt = dict(opt)
    name = opt.pop("type")
    fn = _LOSSES[name]
    if name == "PSNRLoss" and "toY" in opt:
        opt["to_y"] = opt.pop("toY")
    return functools.partial(fn, **opt)
