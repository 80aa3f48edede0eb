"""CLIP text and vision towers (Flax) with pseudo-word injection.

Parity targets:
* Text tower — HF CLIPTextModel as used by SD 2.1 (OpenCLIP ViT-H text:
  width 1024, 23 layers, 16 heads, gelu), with the reference's
  `inj_forward_text` embedding splice (main_train_i2t_mapping.py:101-194)
  implemented as a pure function over token embeddings instead of a
  monkeypatch.
* Vision tower — CLIPVisionModel ViT-H/14 (width 1280, 32 layers, 16 heads,
  patch 14, 224 px): returns last_hidden_state (B, 257, 1280) that feeds the
  I2T mapper.

All attention uses jax.nn.dot_product_attention (XLA-fused).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPMLP(nn.Module):
    hidden: int
    out: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = quick_gelu(x) if self.act == "quick_gelu" else \
            jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class CLIPAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, n, d = x.shape
        h = self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        q = nn.Dense(d, name="q_proj", **kw)(x).reshape(b, n, h, d // h)
        k = nn.Dense(d, name="k_proj", **kw)(x).reshape(b, n, h, d // h)
        v = nn.Dense(d, name="v_proj", **kw)(x).reshape(b, n, h, d // h)
        out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        out = out.reshape(b, n, d)
        return nn.Dense(d, name="out_proj", **kw)(out)


class CLIPLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="layer_norm1")(x)
        x = x + CLIPAttention(self.dim, self.num_heads, self.dtype,
                              name="self_attn")(y, causal)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="layer_norm2")(x)
        x = x + CLIPMLP(int(self.dim * self.mlp_ratio), self.dim, self.act,
                        self.dtype, name="mlp")(y)
        return x


def splice_pseudo_words(
    token_embeds: jnp.ndarray,
    inj_embedding: jnp.ndarray,
    inj_index: jnp.ndarray,
) -> jnp.ndarray:
    """Splice pseudo-word embeddings into token embeddings at inj_index.

    Reference semantics (inj_forward_text, main_train_i2t_mapping.py:145-154):
    new[b, idx:idx+L] = inj[b]; new[b, idx+L:] = old[b, idx+1:]; sequence
    length fixed (overflow truncated).

    Args:
      token_embeds: (B, S, D) embedded input ids.
      inj_embedding: (B, L, D) pseudo-word embeddings.
      inj_index: (B,) int position of the placeholder token.
    Returns: (B, S, D).
    """
    b, s, d = token_embeds.shape
    L = inj_embedding.shape[1]
    pos = jnp.arange(s)[None, :]  # (1, S)
    idx = inj_index[:, None]  # (B, 1)
    # source position in the original sequence for the suffix region
    src_pos = jnp.clip(pos - L + 1, 0, s - 1)
    shifted = jnp.take_along_axis(
        token_embeds,
        jnp.broadcast_to(src_pos, (b, s))[:, :, None].astype(jnp.int32),
        axis=1,
    )
    inj_pos = jnp.clip(pos - idx, 0, L - 1)
    inj_at = jnp.take_along_axis(
        inj_embedding,
        jnp.broadcast_to(inj_pos, (b, s))[:, :, None].astype(jnp.int32),
        axis=1,
    )
    in_inj = (pos >= idx) & (pos < idx + L)
    after = pos >= idx + L
    out = jnp.where(in_inj[:, :, None], inj_at, token_embeds)
    out = jnp.where(after[:, :, None], shifted, out)
    return out


class CLIPTextEncoder(nn.Module):
    """SD 2.1 text tower with optional pseudo-word injection."""

    vocab_size: int = 49408
    max_positions: int = 77
    width: int = 1024
    layers: int = 23
    heads: int = 16
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, inj_embedding=None, inj_index=None):
        """Returns (last_hidden_state, pooled_output)."""
        b, s = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, dtype=self.dtype,
                       param_dtype=jnp.float32, name="token_embedding")(
            input_ids)
        if inj_embedding is not None:
            if inj_index is None:
                inj_index = jnp.zeros((b,), jnp.int32)
            tok = splice_pseudo_words(tok, inj_embedding.astype(tok.dtype),
                                      inj_index)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (self.max_positions, self.width))
        x = tok + pos[None, :s].astype(tok.dtype)
        for i in range(self.layers):
            x = CLIPLayer(self.width, self.heads, 4.0, self.act, self.dtype,
                          name=f"layers_{i}")(x, causal=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="final_layer_norm")(x)
        pooled = x[jnp.arange(b), jnp.argmax(input_ids, axis=-1)]
        return x, pooled


class CLIPVisionEncoder(nn.Module):
    """CLIP ViT-H/14 vision tower -> last_hidden_state (B, 1+N, width)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3), CLIP-normalized."""
        b = pixel_values.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embedding")(pixel_values)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, self.width)
        cls = self.param("class_embedding", nn.initializers.zeros,
                         (self.width,))
        cls = jnp.broadcast_to(cls[None, None], (b, 1, self.width)).astype(
            x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (n + 1, self.width))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pre_layrnorm")(x)
        for i in range(self.layers):
            x = CLIPLayer(self.width, self.heads, 4.0, self.act, self.dtype,
                          name=f"layers_{i}")(x, causal=False)
        return x  # last_hidden_state (pre post_layernorm, matching HF)
