"""Stable Diffusion AutoencoderKL (VAE) in Flax (NHWC).

Parity target: diffusers AutoencoderKL as used by SD 2.1 (frozen in the
reference's pipeline A — main_train_i2t_mapping.py:568, 710-711: encode *
0.18215; main_generate_reference.py decode/0.18215).

Config (SD 2.x): block_out_channels (128, 256, 512, 512), 2 layers/block,
latent 4 channels, GroupNorm(32, eps 1e-6), silu.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

SCALING_FACTOR = 0.18215


def _gn(name, dtype, ch=None, groups=32):
    # real SD channel counts are multiples of 32; tiny test configs fall
    # back to the gcd so GroupNorm stays valid
    import math as _math
    if ch is not None:
        groups = _math.gcd(groups, ch)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn("norm1", self.dtype, x.shape[-1])(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = _gn("norm2", self.dtype, h.shape[-1])(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over HW (VAE mid block)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn("group_norm", self.dtype, x.shape[-1])(x)
        y = y.reshape(b, h * w, c)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        q = nn.Dense(c, name="to_q", **kw)(y)
        k = nn.Dense(c, name="to_k", **kw)(y)
        v = nn.Dense(c, name="to_v", **kw)(y)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c).astype(q.dtype),
            axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, name="to_out", **kw)(out)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        for bi, c in enumerate(ch):
            for li in range(self.layers_per_block):
                x = ResnetBlock(c, self.dtype,
                                name=f"down_{bi}_resnet_{li}")(x)
            if bi < len(ch) - 1:
                # asymmetric pad (0,1) like diffusers Downsample2D
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down_{bi}_downsample")(x)
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_1")(x)
        x = _gn("conv_norm_out", self.dtype, x.shape[-1])(x)
        x = jax.nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_out")(x)
        return nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="quant_conv")(x)


class VAEDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.block_out_channels
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="post_quant_conv")(z)
        x = nn.Conv(ch[-1], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[-1], self.dtype, name="mid_resnet_1")(x)
        rev = list(reversed(ch))
        for bi, c in enumerate(rev):
            for li in range(self.layers_per_block + 1):
                x = ResnetBlock(c, self.dtype, name=f"up_{bi}_resnet_{li}")(x)
            if bi < len(rev) - 1:
                b, h, w, cc = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, cc), "nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"up_{bi}_upsample")(x)
        x = _gn("conv_norm_out", self.dtype, x.shape[-1])(x)
        x = jax.nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.block_out_channels,
                                  self.layers_per_block,
                                  self.latent_channels, self.dtype)
        self.decoder = VAEDecoder(self.block_out_channels,
                                  self.layers_per_block,
                                  self.latent_channels, self.dtype)

    def encode_moments(self, x):
        """(B, H, W, 3) -> (mean, logvar) each (B, H/8, W/8, 4)."""
        m = self.encoder(x)
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x, rng):
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng):
        z = self.encode_sample(x, rng)
        return self.decode(z)
