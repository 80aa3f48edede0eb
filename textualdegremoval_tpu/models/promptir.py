"""PromptIR (+RefFusion) in Flax (NHWC).

Parity target: reference models/archs/network_promptir_guided_arch.py
(PromptGenBlock :417-437, PromptIR :443-591, PromptIRRefFusion :593-1093).

The trunk is Restormer-style (MDTA+GDFN blocks, reused from models.layers)
plus decoder-side prompt-interaction blocks.  The prompt dims are the
reference's hardcoded values (64/128/320 at sizes 64/32/16), which are only
shape-consistent with decoder=True and dim=48 — we keep them verbatim so
checkpoints convert.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.models.layers import (
    TransformerBlock,
    tblock_stage,
    TransformerResFusionBlock,
    OverlapPatchEmbed,
    Downsample,
    Upsample,
    MASAEncoder,
    masa_encode_pair,
)
from textualdegremoval_tpu.ops import pad_to_multiple, masa_match_and_warp


class PromptGenBlock(nn.Module):
    """Learned prompt bank softmax-combined by GAP features, bilinearly
    resized, 3x3-conv mixed (reference :417-437)."""

    prompt_dim: int = 128
    prompt_len: int = 5
    prompt_size: int = 96
    lin_dim: int = 192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        prompt_param = self.param(
            "prompt_param", nn.initializers.uniform(scale=1.0),
            (1, self.prompt_len, self.prompt_size, self.prompt_size,
             self.prompt_dim),
        )
        emb = jnp.mean(x, axis=(1, 2))
        weights = jax.nn.softmax(
            nn.Dense(self.prompt_len, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear_layer")(emb),
            axis=1,
        )
        prompt = jnp.sum(
            weights[:, :, None, None, None].astype(self.dtype) *
            prompt_param.astype(self.dtype), axis=1
        )  # (B, S, S, prompt_dim)
        from textualdegremoval_tpu.ops.resize import bilinear_resize_torch

        prompt = bilinear_resize_torch(prompt, h, w)
        return nn.Conv(self.prompt_dim, (3, 3), padding=1, use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv3x3")(prompt)


def _promptir_trunk(self, inp, warp=None):
    """Shared trunk body executed inside PromptIR / PromptIRRefFusion's
    compact scope — submodules land at top-level names so reference
    checkpoints key-map mechanically.  `warp` enables RefFusion injection."""
    if True:
        d = self.dim
        fused = getattr(self, "fused", None)
        bwd_mode = getattr(self, "bwd_mode", None)
        kw = dict(ffn_expansion_factor=self.ffn_expansion_factor,
                  use_bias=self.bias, ln_type=self.ln_type, dtype=self.dtype,
                  fused=fused, bwd_mode=bwd_mode)

        def blocks(dim, heads, n, name):
            def run(x):
                return tblock_stage(x, dim, heads, n, name,
                                    chain=getattr(self, "chain", None), **kw)
            return run

        def fuse(x, warp_l, heads, n, name):
            cat = jnp.concatenate([x, warp_l.astype(x.dtype)], axis=-1)
            dim2 = cat.shape[-1]
            for i in range(n):
                cat = TransformerResFusionBlock(dim2, heads, **kw,
                                                name=f"{name}_{i}")(cat)
            return cat[..., : dim2 // 2]

        conv_kw = dict(use_bias=self.bias, dtype=self.dtype,
                       param_dtype=jnp.float32)

        x = OverlapPatchEmbed(d, self.bias, self.dtype, name="patch_embed")(inp)
        if warp is not None:
            x = fuse(x, warp[0], self.heads[0], self.reffusion_n_blocks[0],
                     "masa_blk_enc_level1")
        e1 = blocks(d, self.heads[0], self.num_blocks[0], "encoder_level1")(x)

        x = Downsample(d, self.dtype, name="down1_2")(e1)
        if warp is not None:
            x = fuse(x, warp[1], self.heads[1], self.reffusion_n_blocks[1],
                     "masa_blk_enc_level2")
        e2 = blocks(d * 2, self.heads[1], self.num_blocks[1],
                    "encoder_level2")(x)

        x = Downsample(d * 2, self.dtype, name="down2_3")(e2)
        if warp is not None:
            x = fuse(x, warp[2], self.heads[2], self.reffusion_n_blocks[2],
                     "masa_blk_enc_level3")
        e3 = blocks(d * 4, self.heads[2], self.num_blocks[2],
                    "encoder_level3")(x)

        x = Downsample(d * 4, self.dtype, name="down3_4")(e3)
        if warp is not None:
            x = fuse(x, warp[3], self.heads[3], self.reffusion_n_blocks[3],
                     "masa_blk_enc_level4")
        latent = blocks(d * 8, self.heads[3], self.num_blocks[3],
                        "latent")(x)

        if self.decoder:
            dec3 = PromptGenBlock(320, 5, 16, d * 8, self.dtype,
                                  name="prompt3")(latent)
            latent = jnp.concatenate([latent, dec3], axis=-1)
            latent = TransformerBlock(d * 8 + 320, self.heads[2], **kw,
                                      name="noise_level3")(latent)
            latent = nn.Conv(d * 4, (1, 1), name="reduce_noise_level3",
                             **conv_kw)(latent)

        y = Upsample(d * 4, self.dtype, name="up4_3")(latent)
        y = jnp.concatenate([y, e3], axis=-1)
        y = nn.Conv(d * 4, (1, 1), name="reduce_chan_level3", **conv_kw)(y)
        y = blocks(d * 4, self.heads[2], self.num_blocks[2],
                   "decoder_level3")(y)

        if self.decoder:
            dec2 = PromptGenBlock(128, 5, 32, d * 4, self.dtype,
                                  name="prompt2")(y)
            y = jnp.concatenate([y, dec2], axis=-1)
            y = TransformerBlock(d * 4 + 128, self.heads[2], **kw,
                                 name="noise_level2")(y)
            y = nn.Conv(d * 4, (1, 1), name="reduce_noise_level2",
                        **conv_kw)(y)

        y = Upsample(d * 4, self.dtype, name="up3_2")(y)
        y = jnp.concatenate([y, e2], axis=-1)
        y = nn.Conv(d * 2, (1, 1), name="reduce_chan_level2", **conv_kw)(y)
        y = blocks(d * 2, self.heads[1], self.num_blocks[1],
                   "decoder_level2")(y)

        if self.decoder:
            dec1 = PromptGenBlock(64, 5, 64, d * 2, self.dtype,
                                  name="prompt1")(y)
            y = jnp.concatenate([y, dec1], axis=-1)
            y = TransformerBlock(d * 2 + 64, self.heads[2], **kw,
                                 name="noise_level1")(y)
            y = nn.Conv(d * 2, (1, 1), name="reduce_noise_level1",
                        **conv_kw)(y)

        y = Upsample(d * 2, self.dtype, name="up2_1")(y)
        y = jnp.concatenate([y, e1], axis=-1)
        y = blocks(d * 2, self.heads[0], self.num_blocks[0],
                   "decoder_level1")(y)
        y = blocks(d * 2, self.heads[0], self.num_refinement_blocks,
                   "refinement")(y)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, name="output",
                      **conv_kw)(y)
        return out + inp.astype(out.dtype)


class PromptIR(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    decoder: bool = True
    dtype: jnp.dtype = jnp.float32
    fused: bool | None = None
    bwd_mode: str | None = None
    chain: bool | None = None

    @nn.compact
    def __call__(self, inp_img):
        b, h0, w0, _ = inp_img.shape
        x = pad_to_multiple(inp_img, 8)
        out = _promptir_trunk(self, x)
        return out[:, :h0, :w0]


class PromptIRRefFusion(nn.Module):
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    decoder: bool = True
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
    fused: bool | None = None
    bwd_mode: str | None = None
    chain: bool | None = None

    @nn.compact
    def __call__(self, inp_img, ref_img):
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
        out = _promptir_trunk(self, inp, warp)
        return out[:, :h0, :w0]
