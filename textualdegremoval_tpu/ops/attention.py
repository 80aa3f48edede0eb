"""Channel-attention primitives (MDTA, TKSA) as pure functions.

Both operate on *transposed* attention: the attention matrix is C×C per head
(linear in spatial size), which is exactly why these backbones scale to big
images.  The C×C grams are MXU-friendly matmuls.

Inputs are (B, heads, c, L) where c = channels-per-head and L = H*W.

Parity targets:
* MDTA — reference models/archs/network_restormer_guided_arch.py:246-277:
  q, k L2-normalized along L, attn = (q @ k^T) * temperature, softmax over
  the last axis, out = attn @ v.
* TKSA — reference models/archs/network_drsformer_guided_arch.py:260-330:
  same gram, then four sparsified softmaxes keeping the per-row top
  C/2, 2C/3, 3C/4, 4C/5 entries (-inf elsewhere), blended with learnable
  scalar weights.  The TPU version derives all four masks from a single
  `lax.top_k` (threshold compare) instead of four scatter_ passes: one sort
  instead of four, and no scatter.  Ties at the threshold are kept (the
  reference keeps exactly k by index order); with continuous float scores
  this is measure-zero.
"""

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def mdta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
) -> jnp.ndarray:
    """Transposed (channel) attention.

    Args:
      q, k, v: (B, heads, c, L).
      temperature: broadcastable to (heads, 1, 1) — per-head scale.
    Returns:
      (B, heads, c, L).
    """
    dt = q.dtype
    q = _l2_normalize(q.astype(jnp.float32), axis=-1)
    k = _l2_normalize(k.astype(jnp.float32), axis=-1)
    attn = jnp.einsum("bhcl,bhdl->bhcd", q, k) * temperature.astype(jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhcd,bhdl->bhcl", attn.astype(dt), v)
    return out


def mdta_attention_nhwc(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    heads: int,
) -> jnp.ndarray:
    """MDTA directly on NHWC tensors — no head transposes.

    The (B, heads, c, L) layout forces two materialized transposes of the
    full-resolution tensor per call; this variant reads q/k/v as
    (B, H, W, C), folds HW into the contraction axis of the C x C gram, and
    writes the output back in NHWC.  L2 statistics are accumulated in f32
    without materializing f32 copies of the activations.

    Args:
      q, k, v: (B, H, W, C).
      temperature: (heads, 1, 1).
    Returns:
      (B, H, W, C).
    """
    b, h, w, c = q.shape
    cph = c // heads
    dt = q.dtype

    def heads_view(t):
        return t.reshape(b, h * w, heads, cph)

    qh, kh, vh = heads_view(q), heads_view(k), heads_view(v)
    # rsqrt norms over the spatial axis, f32 accumulation only
    qn = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=1,
                            keepdims=True), 1e-24))
    kn = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(jnp.square(kh.astype(jnp.float32)), axis=1,
                            keepdims=True), 1e-24))
    # C x C gram per head, f32 accumulate on the MXU
    attn = jnp.einsum("bnhc,bnhd->bhcd", qh, kh,
                      preferred_element_type=jnp.float32)
    attn = attn * (qn.transpose(0, 2, 3, 1) * kn.transpose(0, 2, 1, 3))
    attn = jax.nn.softmax(attn * temperature.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhcd,bnhd->bnhc", attn.astype(dt), vh)
    return out.reshape(b, h, w, c)


def tksa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    blend: jnp.ndarray,
) -> jnp.ndarray:
    """Top-k sparse channel attention with 4 sparsity levels.

    Args:
      q, k, v: (B, heads, c, L).
      temperature: broadcastable per-head scale.
      blend: (4,) learnable blend weights (reference attn1..attn4).
    Returns:
      (B, heads, c, L).
    """
    dt = q.dtype
    qf = _l2_normalize(q.astype(jnp.float32), axis=-1)
    kf = _l2_normalize(k.astype(jnp.float32), axis=-1)
    attn = jnp.einsum("bhcl,bhdl->bhcd", qf, kf) * temperature.astype(jnp.float32)

    c = attn.shape[-1]
    ks = [int(c / 2), int(c * 2 / 3), int(c * 3 / 4), int(c * 4 / 5)]
    kmax = max(ks)
    # One top-k (sorted desc) gives every threshold.
    top_vals = jax.lax.top_k(attn, kmax)[0]  # (B, h, c, kmax)

    # Blend the four masked softmaxes on the cheap C x C matrices FIRST,
    # then do ONE attention-value product — out = (sum_i w_i a_i) @ v is
    # algebraically identical to sum_i w_i (a_i @ v) but does a quarter of
    # the L-sized matmul work (the reference's four attn @ v products are
    # the dominant cost, network_drsformer_guided_arch.py:320-325).
    blended = jnp.zeros_like(attn)
    for i, kk in enumerate(ks):
        thresh = top_vals[..., kk - 1 : kk]  # k-th largest per row
        masked = jnp.where(attn >= thresh, attn, -jnp.inf)
        blended = blended + blend[i].astype(jnp.float32) * jax.nn.softmax(
            masked, axis=-1)
    out = jnp.einsum("bhcd,bhdl->bhcl", blended.astype(dt), v)
    return out
