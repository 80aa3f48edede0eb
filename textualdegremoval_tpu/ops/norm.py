"""Channel layer-norm variants used by the restoration backbones.

Parity targets (semantics only, re-derived from the math):
* BiasFree / WithBias LayerNorm — reference
  models/archs/network_restormer_guided_arch.py:172-218 (variance is the
  biased estimator, eps=1e-5, normalization over the channel axis).
* LayerNorm2d — reference models/archs/nafnet_arch_utils.py:264-300
  (standard LN over channels, eps=1e-6; the reference hand-writes the
  autograd, here JAX autodiff handles it).

All functions take NHWC and normalize the last axis.  Computation is done in
float32 regardless of input dtype (LN is variance-sensitive in bf16) and cast
back, which XLA fuses into neighbouring ops.
"""

import jax.numpy as jnp


def _moments(xf: jnp.ndarray):
    """(mean, variance) over the channel axis in ONE pass over x.

    ``jnp.var`` lowers to mean(x) followed by mean((x - mu)^2) — two
    sequential reduce passes over an HBM-resident tensor, because the second
    reduce's input depends on the first's output.  E[x^2] - E[x]^2 lets XLA
    compute both reduces from the same read (multi-output fusion), cutting
    LN traffic from 3 passes to 2 — ~4 GB on the 72 LN instances of the
    512 px flagship.  f32 throughout; activations are O(1) so the
    cancellation error is ~1e-7, far under the parity tolerances."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return mu, jnp.maximum(sq - mu * mu, 0.0)


def bias_free_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5):
    """x / sqrt(var(x) + eps) * weight, var over channel without mean removal
    of the output (the mean still participates in the variance)."""
    xf = x.astype(jnp.float32)
    _, var = _moments(xf)
    y = xf / jnp.sqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def with_bias_layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
):
    xf = x.astype(jnp.float32)
    mu, var = _moments(xf)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def layer_norm_2d(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
):
    """NAFNet's LayerNorm2d: plain LN over the channel axis, eps=1e-6."""
    return with_bias_layer_norm(x, weight, bias, eps=eps)
