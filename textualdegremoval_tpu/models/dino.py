"""DINOv2 vision transformer (frozen matcher tower) in Flax.

Parity target: reference models/dino/ (PatchEmbed, Attention, LayerScale,
Mlp, NestedTensorBlock, DinoVisionTransformer with bicubic pos-emb
interpolation, vision_transformers.py:179-207,320-393).  Forward returns
**patch tokens** (B, N, D) like the reference's forward (:320-326).

Used frozen at img_size=518, patch_size=14, init_values=1.0 as the
ref-crop matcher (image_restoration_ref_model.py:75-91).  The xformers
memory_efficient_attention path maps to jax.nn.dot_product_attention (XLA
fuses it; a Pallas flash kernel is unnecessary at 37x37=1369 tokens).

select_ref_crop() reimplements the trainer's no-grad window matching
(image_restoration_ref_model.py:219-247) as a pure jittable function.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class DinoMlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class DinoSwiGLU(nn.Module):
    """SwiGLU FFN (reference models/dino/swiglu_ffn.py:14-34): one fused
    w12 projection to 2*hidden, silu(x1)*x2 gate, w3 out.  hidden follows
    SwiGLUFFNFused's rule: (int(4*dim * 2/3) + 7) // 8 * 8."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, dtype=self.dtype,
                       param_dtype=jnp.float32, name="w12")(x)
        x1, x2 = x12[..., :self.hidden], x12[..., self.hidden:]
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="w3")(jax.nn.silu(x1) * x2)


class DinoAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = self.num_heads
        qkv = nn.Dense(d * 3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, dh)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    dtype: jnp.dtype = jnp.float32
    ffn_layer: str = "mlp"  # "mlp" | "swiglufused" (vision_transformers.py:121-126)

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma",
                         nn.initializers.constant(self.init_values),
                         (self.dim,))
        ls2 = self.param("ls2_gamma",
                         nn.initializers.constant(self.init_values),
                         (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        x = x + DinoAttention(self.dim, self.num_heads, self.dtype,
                              name="attn")(y) * ls1.astype(x.dtype)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        if self.ffn_layer == "swiglufused":
            hidden = (int(self.dim * self.mlp_ratio * 2 / 3) + 7) // 8 * 8
            ffn = DinoSwiGLU(hidden, self.dim, self.dtype, name="mlp")
        else:
            ffn = DinoMlp(int(self.dim * self.mlp_ratio), self.dim,
                          self.dtype, name="mlp")
        x = x + ffn(y) * ls2.astype(x.dtype)
        return x


class DinoVisionTransformer(nn.Module):
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    dtype: jnp.dtype = jnp.float32
    ffn_layer: str = "mlp"

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3), H/W multiples of patch_size.
        Returns normalized patch tokens (B, N, D)."""
        b, H, W, _ = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        n0 = (self.img_size // p) ** 2
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, n0 + 1, self.embed_dim))

        # bicubic pos-emb interpolation (reference
        # vision_transformers.py:179-207)
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:]
        g0 = self.img_size // p
        if (gh, gw) != (g0, g0):
            patch_pos = patch_pos.reshape(1, g0, g0, self.embed_dim)
            patch_pos = jax.image.resize(
                patch_pos, (1, gh, gw, self.embed_dim), method="bicubic")
            patch_pos = patch_pos.reshape(1, gh * gw, self.embed_dim)

        cls = jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(x.dtype)

        for i in range(self.depth):
            x = DinoBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.init_values, self.dtype, self.ffn_layer,
                          name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(x)
        return x[:, 1:]  # patch tokens


def vit_base(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_small(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_large(**kw) -> DinoVisionTransformer:
    return DinoVisionTransformer(embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_giant2(**kw) -> DinoVisionTransformer:
    """DINOv2 ViT-g/14 (reference vision_transformers.py:379-393): embed
    1536, depth 40, 24 heads (64 per head), SwiGLU-fused FFN."""
    kw.setdefault("ffn_layer", "swiglufused")
    return DinoVisionTransformer(embed_dim=1536, depth=40, num_heads=24, **kw)


# ---------------------------------------------------------------------------
# ref-crop selection (trainer-side matcher)
# ---------------------------------------------------------------------------


def extract_ref_windows(ref: jnp.ndarray, patch: int, stride: int):
    """Unfold ref (B, Hr, Wr, C) into overlapping (patch x patch) windows.
    Returns (B, N, patch, patch, C)."""
    b, hr, wr, c = ref.shape
    ny = (hr - patch) // stride + 1
    nx = (wr - patch) // stride + 1

    def one(img, iy, ix):
        return jax.lax.dynamic_slice(img, (iy * stride, ix * stride, 0),
                                     (patch, patch, c))

    iy = jnp.repeat(jnp.arange(ny), nx)
    ix = jnp.tile(jnp.arange(nx), ny)
    per_img = jax.vmap(one, in_axes=(None, 0, 0))
    return jax.vmap(per_img, in_axes=(0, None, None))(ref, iy, ix)


def select_ref_crop(dino_apply, dino_vars, lq: jnp.ndarray, ref: jnp.ndarray):
    """Pick the ref window most similar to lq under DINO features.

    Reference semantics (image_restoration_ref_model.py:219-247): unfold ref
    into train_patch_size windows at stride H/4, DINO-embed the bilinearly
    14-aligned lq and windows, cosine top-1, gather.

    Returns (B, th, tw, C).
    """
    b, th, tw, c = lq.shape
    stride = th // 4
    windows = extract_ref_windows(ref, th, stride)  # (B, N, th, tw, C)
    n = windows.shape[1]

    def to14(x):
        h14 = int(math.ceil(th / 14) * 14)
        w14 = int(math.ceil(tw / 14) * 14)
        return jax.image.resize(x, (x.shape[0], h14, w14, c), "bilinear")

    feat_l = dino_apply(dino_vars, to14(lq)).reshape(b, 1, -1)
    wflat = windows.reshape(b * n, th, tw, c)
    feat_r = dino_apply(dino_vars, to14(wflat)).reshape(b, n, -1)

    def l2n(x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    corr = jnp.einsum("bod,bnd->bon", l2n(feat_l), l2n(feat_r))[:, 0]
    top1 = jnp.argmax(corr, axis=-1)  # (B,)
    return jax.vmap(lambda w, i: w[i])(windows, top1)
