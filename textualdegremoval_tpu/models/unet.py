"""SD 2.1 UNet (UNet2DConditionModel) in Flax (NHWC), with the reference's
global-k/v cross-attention injection as first-class parameters.

Parity target: diffusers 0.16 UNet2DConditionModel (stable-diffusion-2-1
config: blocks 320/640/1280/1280, 2 layers/block, head_dim 64, context 1024,
linear transformer projections) + the reference's monkeypatched
`inj_forward_crossattention` (main_train_i2t_mapping.py:197-233, wiring
:573-612): every attn2 owns trainable to_k_global/to_v_global copies used
when conditioning on injected pseudo-word states.

`use_global_kv` routes cross-attention K/V through the global projections —
the functional equivalent of the reference's CONTEXT_TENSOR dict protocol.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.ops.flash_attn import (
    flash_attn_default, self_attention)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip_sin_cos: bool = True, shift: float = 0.0):
    """diffusers Timesteps embedding: half sin / half cos, flip order."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_cos else [sin, cos], axis=-1)


def _gn(name, dtype, ch=None, groups=32, eps=1e-5):
    import math as _math
    if ch is not None:
        groups = _math.gcd(groups, ch)
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = _gn("norm1", self.dtype, x.shape[-1])(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, :]
        h = _gn("norm2", self.dtype, h.shape[-1])(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Attention with optional global K/V projections for injected context."""

    dim: int
    context_dim: int | None = None  # None = self-attention
    head_dim: int = 64
    with_global_kv: bool = False
    dtype: jnp.dtype = jnp.float32
    # None -> flash_attn_default() (ON on TPU backends; $TDR_FLASH_ATTN
    # overrides).  Applies only where ops/flash_attn.flash_applies — i.e.
    # the long-seq self-attentions; cross-attn (kv = 77 tokens) and short
    # sequences stay on the XLA path.
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, context=None, use_global_kv: bool = False):
        b, n, d = x.shape
        heads = d // self.head_dim
        ctx = x if context is None else context
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        q = nn.Dense(d, name="to_q", **kw)(x)
        if use_global_kv and self.with_global_kv:
            k = nn.Dense(d, name="to_k_global", **kw)(ctx)
            v = nn.Dense(d, name="to_v_global", **kw)(ctx)
        else:
            k = nn.Dense(d, name="to_k", **kw)(ctx)
            v = nn.Dense(d, name="to_v", **kw)(ctx)
        if self.with_global_kv and not use_global_kv:
            # keep global params in the tree even when unused this call
            nn.Dense(d, name="to_k_global", **kw)(ctx[:, :1])
            nn.Dense(d, name="to_v_global", **kw)(ctx[:, :1])
        q = q.reshape(b, n, heads, self.head_dim)
        k = k.reshape(b, -1, heads, self.head_dim)
        v = v.reshape(b, -1, heads, self.head_dim)
        use_flash = (flash_attn_default() if self.attn_impl is None
                     else self.attn_impl == "flash")
        out = self_attention(q, k, v, use_flash=use_flash)
        out = out.reshape(b, n, d)
        return nn.Dense(d, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class GEGLU(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(g, approximate=False)


class BasicTransformerBlock(nn.Module):
    dim: int
    context_dim: int = 1024
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, context, use_global_kv: bool = False):
        kw = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        x = x + CrossAttention(self.dim, None, self.head_dim, False,
                               self.dtype, self.attn_impl, name="attn1")(
            nn.LayerNorm(**kw, name="norm1")(x))
        x = x + CrossAttention(self.dim, self.context_dim, self.head_dim,
                               True, self.dtype, self.attn_impl,
                               name="attn2")(
            nn.LayerNorm(**kw, name="norm2")(x), context, use_global_kv)
        y = nn.LayerNorm(**kw, name="norm3")(x)
        y = GEGLU(self.dim * 4, self.dtype, name="ff_geglu")(y)
        x = x + nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name="ff_out")(y)
        return x


class Transformer2D(nn.Module):
    dim: int
    context_dim: int = 1024
    head_dim: int = 64
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, context, use_global_kv: bool = False):
        b, h, w, c = x.shape
        res = x
        x = _gn("norm", self.dtype, x.shape[-1], eps=1e-6)(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(self.dim, self.context_dim,
                                      self.head_dim, self.dtype,
                                      self.attn_impl,
                                      name=f"blocks_{i}")(
                x, context, use_global_kv)
        x = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_out")(x)
        return x.reshape(b, h, w, c) + res


class UNet2DCondition(nn.Module):
    """SD 2.x UNet; __call__(latents NHWC, timesteps, context)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    context_dim: int = 1024
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, t, context, use_global_kv: bool = False):
        ch = self.block_out_channels
        temb_dim = ch[0] * 4
        temb = timestep_embedding(t, ch[0])
        temb = nn.Dense(temb_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="time_emb_1")(temb.astype(self.dtype))
        temb = nn.Dense(temb_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="time_emb_2")(jax.nn.silu(temb))

        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        skips = [x]

        # down blocks: 3x CrossAttnDown + 1 plain Down
        for bi, c in enumerate(ch):
            has_attn = bi < len(ch) - 1
            for li in range(self.layers_per_block):
                x = ResnetBlock(c, self.dtype,
                                name=f"down_{bi}_resnet_{li}")(x, temb)
                if has_attn:
                    x = Transformer2D(c, self.context_dim, self.head_dim, 1,
                                      self.dtype, self.attn_impl,
                                      name=f"down_{bi}_attn_{li}")(
                        x, context, use_global_kv)
                skips.append(x)
            if bi < len(ch) - 1:
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{bi}_downsample")(x)
                skips.append(x)

        # mid
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_0")(x, temb)
        x = Transformer2D(ch[-1], self.context_dim, self.head_dim, 1,
                          self.dtype, self.attn_impl, name="mid_attn")(
            x, context, use_global_kv)
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_1")(x, temb)

        # up blocks (reverse)
        rev = list(reversed(ch))
        for bi, c in enumerate(rev):
            has_attn = bi > 0
            for li in range(self.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(c, self.dtype,
                                name=f"up_{bi}_resnet_{li}")(x, temb)
                if has_attn:
                    x = Transformer2D(c, self.context_dim, self.head_dim, 1,
                                      self.dtype, self.attn_impl,
                                      name=f"up_{bi}_attn_{li}")(
                        x, context, use_global_kv)
            if bi < len(rev) - 1:
                b, hh, ww, cc = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, cc), "nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{bi}_upsample")(x)

        x = _gn("conv_norm_out", self.dtype, x.shape[-1])(x)
        x = jax.nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv_out")(x)
