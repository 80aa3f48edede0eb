"""DRSformer (+RefFusion, +200L/SPA variant without MEFC) in Flax (NHWC).

Parity target: reference models/archs/network_drsformer_guided_arch.py
(TKSA Attention :260-330, MSFN :216-256, MEFC :371-547, DRSformer :586-680,
DRSformerRefFusion :683-1060) and
network_drsformer_guided_arch_200L_SPA.py (same minus MEFC stages).

The 200L/SPA variant is the `use_mefc=False` flag, not a separate file.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from textualdegremoval_tpu.models.layers import (
    ChannelLayerNorm,
    OverlapPatchEmbed,
    Downsample,
    Upsample,
    MASAEncoder,
    masa_encode_pair,
)
from textualdegremoval_tpu.ops import tksa_attention, pad_to_multiple
from textualdegremoval_tpu.ops import masa_match_and_warp


class TKSAAttention(nn.Module):
    """Top-k sparse channel attention (reference :260-330)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        cph = c // heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (heads, 1, 1))
        blend = jnp.concatenate([
            self.param(f"attn{i}", nn.initializers.constant(0.2), (1,))
            for i in range(1, 5)
        ])
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=self.use_bias,
                      dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = nn.Conv(self.dim * 3, (3, 3), padding=1,
                      feature_group_count=self.dim * 3, use_bias=self.use_bias,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_heads(t):
            return t.reshape(b, h * w, heads, cph).transpose(0, 2, 3, 1)

        out = tksa_attention(to_heads(q), to_heads(k), to_heads(v),
                             temperature, blend)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="project_out")(out)


class MSFN(nn.Module):
    """Mixed-scale (3x3 + 5x5) gated dconv FFN (reference :216-256)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ffn_expansion_factor)
        kw = dict(use_bias=self.use_bias, dtype=self.dtype,
                  param_dtype=jnp.float32)
        x = nn.Conv(hidden * 2, (1, 1), name="project_in", **kw)(x)
        x3 = nn.relu(nn.Conv(hidden * 2, (3, 3), padding=1,
                             feature_group_count=hidden * 2,
                             name="dwconv3x3", **kw)(x))
        x5 = nn.relu(nn.Conv(hidden * 2, (5, 5), padding=2,
                             feature_group_count=hidden * 2,
                             name="dwconv5x5", **kw)(x))
        x1_3, x2_3 = jnp.split(x3, 2, axis=-1)
        x1_5, x2_5 = jnp.split(x5, 2, axis=-1)
        x1 = jnp.concatenate([x1_3, x1_5], axis=-1)
        x2 = jnp.concatenate([x2_3, x2_5], axis=-1)
        x1 = nn.relu(nn.Conv(hidden, (3, 3), padding=1,
                             feature_group_count=hidden,
                             name="dwconv3x3_1", **kw)(x1))
        x2 = nn.relu(nn.Conv(hidden, (5, 5), padding=2,
                             feature_group_count=hidden,
                             name="dwconv5x5_1", **kw)(x2))
        x = jnp.concatenate([x1, x2], axis=-1)
        return nn.Conv(self.dim, (1, 1), name="project_out", **kw)(x)


class SparseTransformerBlock(nn.Module):
    """STB: TKSA + MSFN (reference :334-347)."""

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    fusion: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = x + TKSAAttention(self.dim, self.num_heads, self.use_bias,
                              self.dtype, name="attn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm1")(x))
        x = x + MSFN(self.dim, self.ffn_expansion_factor, self.use_bias,
                     self.dtype, name="ffn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm2")(x))
        if self.fusion:
            alpha = self.param("alpha", nn.initializers.zeros, (1,))
            return x * alpha.astype(x.dtype) + shortcut
        return x


# ---------------------------------------------------------------------------
# MEFC: DARTS-style 8-op mixture (reference :371-547)
# ---------------------------------------------------------------------------


def _avg_pool_3x3(x):
    """AvgPool2d(3, stride 1, pad 1, count_include_pad=False)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                            [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


class SepConvOp(nn.Module):
    dim: int
    ksize: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, p = self.ksize, self.ksize // 2
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(self.dim, (k, k), padding=p,
                    feature_group_count=self.dim, name="dw1", **kw)(x)
        x = nn.Conv(self.dim, (1, 1), name="pw1", **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, (k, k), padding=p,
                    feature_group_count=self.dim, name="dw2", **kw)(x)
        return nn.Conv(self.dim, (1, 1), name="pw2", **kw)(x)


class DilConvOp(nn.Module):
    dim: int
    ksize: int
    dilation: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.ksize
        p = (k - 1) * self.dilation // 2
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.Conv(self.dim, (k, k), padding=p,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.dim, name="dw", **kw)(x)
        return nn.Conv(self.dim, (1, 1), name="pw", **kw)(x)


class OperationLayer(nn.Module):
    """8 candidate ops, softmax-weighted, concatenated, 1x1-mixed."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, weights):
        # weights: (B, num_ops)
        states = []
        specs = [("sep_conv_1x1", 1), ("sep_conv_3x3", 3), ("sep_conv_5x5", 5),
                 ("sep_conv_7x7", 7)]
        for name, k in specs:
            states.append(SepConvOp(self.dim, k, self.dtype, name=name)(x))
        for name, k in [("dil_conv_3x3", 3), ("dil_conv_5x5", 5),
                        ("dil_conv_7x7", 7)]:
            states.append(DilConvOp(self.dim, k, 2, self.dtype, name=name)(x))
        states.append(_avg_pool_3x3(x))
        out = jnp.concatenate(
            [s * weights[:, i, None, None, None].astype(s.dtype)
             for i, s in enumerate(states)], axis=-1)
        out = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(out)
        return nn.relu(out)


class MEFC(nn.Module):
    """subnet: OALayer routing + `steps` OperationLayers with residual relu
    (reference :522-547)."""

    dim: int
    steps: int = 4
    num_ops: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # OALayer: GAP -> MLP -> (B, steps, num_ops) softmax over ops
        pooled = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.steps * self.num_ops * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ca_fc1")(pooled)
        y = nn.relu(y)
        y = nn.Dense(self.steps * self.num_ops, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ca_fc2")(y)
        weights = jax.nn.softmax(
            y.reshape(-1, self.steps, self.num_ops), axis=-1)

        # GroupOLs: preprocess (bias-free conv1x1 + relu, the reference's
        # ReLUConv), then steps of op layers
        x = nn.relu(nn.Conv(self.dim, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="preprocess")(x))
        for i in range(self.steps):
            res = x
            x = OperationLayer(self.dim, self.dtype, name=f"ops_{i}")(
                x, weights[:, i])
            x = nn.relu(x + res)
        return x


class DRSformer(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    use_mefc: bool = True  # False for Rain200L / SPA-Data variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(ffn_expansion_factor=self.ffn_expansion_factor,
                  use_bias=self.bias, ln_type=self.ln_type, dtype=self.dtype)

        def blocks(dim, heads, n, name):
            def run(x):
                for i in range(n):
                    x = SparseTransformerBlock(dim, heads, **kw,
                                               name=f"{name}_{i}")(x)
                return x
            return run

        b, h0, w0, _ = inp_img.shape
        x = pad_to_multiple(inp_img, 8)

        e1_in = OverlapPatchEmbed(d, self.bias, self.dtype,
                                  name="patch_embed")(x)
        if self.use_mefc:
            e1_in = MEFC(d, dtype=self.dtype, name="encoder_level0")(e1_in)
        e1 = blocks(d, self.heads[0], self.num_blocks[0], "encoder_level1")(e1_in)
        e2_in = Downsample(d, self.dtype, name="down1_2")(e1)
        e2 = blocks(d * 2, self.heads[1], self.num_blocks[1],
                    "encoder_level2")(e2_in)
        e3_in = Downsample(d * 2, self.dtype, name="down2_3")(e2)
        e3 = blocks(d * 4, self.heads[2], self.num_blocks[2],
                    "encoder_level3")(e3_in)
        lat_in = Downsample(d * 4, self.dtype, name="down3_4")(e3)
        lat = blocks(d * 8, self.heads[3], self.num_blocks[3], "latent")(lat_in)

        y = Upsample(d * 8, self.dtype, name="up4_3")(lat)
        y = jnp.concatenate([y, e3], axis=-1)
        y = nn.Conv(d * 4, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level3")(y)
        y = blocks(d * 4, self.heads[2], self.num_blocks[2],
                   "decoder_level3")(y)
        y = Upsample(d * 4, self.dtype, name="up3_2")(y)
        y = jnp.concatenate([y, e2], axis=-1)
        y = nn.Conv(d * 2, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level2")(y)
        y = blocks(d * 2, self.heads[1], self.num_blocks[1],
                   "decoder_level2")(y)
        y = Upsample(d * 2, self.dtype, name="up2_1")(y)
        y = jnp.concatenate([y, e1], axis=-1)
        y = blocks(d * 2, self.heads[0], self.num_blocks[0],
                   "decoder_level1")(y)
        if self.use_mefc:
            y = MEFC(d * 2, dtype=self.dtype, name="refinement")(y)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      use_bias=self.bias, dtype=self.dtype,
                      param_dtype=jnp.float32, name="output")(y)
        out = out + x.astype(out.dtype)
        return out[:, :h0, :w0]


class DRSformerRefFusion(nn.Module):
    """DRSformer trunk + 4-level MASA pyramid with sparse fusion blocks."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    use_mefc: bool = True
    nf: int = 48
    ext_n_blocks: Sequence[int] = (4, 4, 4, 4)
    reffusion_n_blocks: Sequence[int] = (2, 2, 2, 2)
    reffusion_n_blocks_middle: int = 1
    num_nbr: int = 1
    psize: int = 3
    lr_block_size: int = 8
    ref_down_block_size: float = 1.5
    dilations: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp_img, ref_img):
        d = self.dim
        kw = dict(ffn_expansion_factor=self.ffn_expansion_factor,
                  use_bias=self.bias, ln_type=self.ln_type, dtype=self.dtype)

        b, h0, w0, _ = inp_img.shape
        pad = 8 * self.lr_block_size
        inp = pad_to_multiple(inp_img, pad)
        ref = pad_to_multiple(ref_img, pad)

        enc = MASAEncoder(self.nf, self.ext_n_blocks, 4, self.dtype,
                          name="masa_enc")
        feat_lq, feat_ref = masa_encode_pair(enc, inp, ref)
        warp = masa_match_and_warp(
            feat_lq[-1], feat_ref,
            lr_block_size=self.lr_block_size,
            ref_down_block_size=self.ref_down_block_size,
            psize=self.psize, dilations=tuple(self.dilations),
        )

        def blocks(dim, heads, n, name):
            def run(x):
                for i in range(n):
                    x = SparseTransformerBlock(dim, heads, **kw,
                                               name=f"{name}_{i}")(x)
                return x
            return run

        def fuse(x, warp_l, heads, n, name):
            cat = jnp.concatenate([x, warp_l.astype(x.dtype)], axis=-1)
            dim2 = cat.shape[-1]
            for i in range(n):
                cat = SparseTransformerBlock(dim2, heads, **kw, fusion=True,
                                             name=f"{name}_{i}")(cat)
            return cat[..., : dim2 // 2]

        x = OverlapPatchEmbed(d, self.bias, self.dtype, name="patch_embed")(inp)
        x = fuse(x, warp[0], self.heads[0], self.reffusion_n_blocks[0],
                 "masa_blk_enc_level1")
        if self.use_mefc:
            x = MEFC(d, dtype=self.dtype, name="encoder_level0")(x)
        e1 = blocks(d, self.heads[0], self.num_blocks[0], "encoder_level1")(x)

        x = Downsample(d, self.dtype, name="down1_2")(e1)
        x = fuse(x, warp[1], self.heads[1], self.reffusion_n_blocks[1],
                 "masa_blk_enc_level2")
        e2 = blocks(d * 2, self.heads[1], self.num_blocks[1],
                    "encoder_level2")(x)

        x = Downsample(d * 2, self.dtype, name="down2_3")(e2)
        x = fuse(x, warp[2], self.heads[2], self.reffusion_n_blocks[2],
                 "masa_blk_enc_level3")
        e3 = blocks(d * 4, self.heads[2], self.num_blocks[2],
                    "encoder_level3")(x)

        x = Downsample(d * 4, self.dtype, name="down3_4")(e3)
        x = fuse(x, warp[3], self.heads[3], self.reffusion_n_blocks[3],
                 "masa_blk_enc_level4")
        lat = blocks(d * 8, self.heads[3], self.num_blocks[3], "latent")(x)

        y = Upsample(d * 8, self.dtype, name="up4_3")(lat)
        y = jnp.concatenate([y, e3], axis=-1)
        y = nn.Conv(d * 4, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level3")(y)
        y = blocks(d * 4, self.heads[2], self.num_blocks[2],
                   "decoder_level3")(y)
        y = Upsample(d * 4, self.dtype, name="up3_2")(y)
        y = jnp.concatenate([y, e2], axis=-1)
        y = nn.Conv(d * 2, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level2")(y)
        y = blocks(d * 2, self.heads[1], self.num_blocks[1],
                   "decoder_level2")(y)
        y = Upsample(d * 2, self.dtype, name="up2_1")(y)
        y = jnp.concatenate([y, e1], axis=-1)
        y = blocks(d * 2, self.heads[0], self.num_blocks[0],
                   "decoder_level1")(y)
        if self.use_mefc:
            y = MEFC(d * 2, dtype=self.dtype, name="refinement")(y)
        out = nn.Conv(self.out_channels, (3, 3), padding=1,
                      use_bias=self.bias, dtype=self.dtype,
                      param_dtype=jnp.float32, name="output")(y)
        out = out + inp.astype(out.dtype)
        return out[:, :h0, :w0]
