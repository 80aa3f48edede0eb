"""Restormer and RestormerRefFusion in Flax (NHWC).

Parity target: reference models/archs/network_restormer_guided_arch.py
(Restormer :396-501, RestormerRefFusion :504-964).  The RefFusion variant
fixes the reference's shipped pyramid-index bug (SURVEY.md §2.5.1): the MASA
encoder here has exactly 4 levels (deepest stride 8 = the trunk's padder
size) and warp scales x1/x2/x4/x8 come from pyramid positions, not hardcoded
indices.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.models.layers import (
    TransformerResFusionBlock,
    tblock_stage,
    OverlapPatchEmbed,
    Downsample,
    Upsample,
    MASAEncoder,
    masa_encode_pair,
)
from textualdegremoval_tpu.ops import pad_to_multiple, masa_match_and_warp


class Restormer(nn.Module):
    """4-level U-shaped transformer with MDTA + GDFN blocks."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    dtype: jnp.dtype = jnp.float32
    # kernel selection (explicit, not process state): fused whole-block
    # Pallas kernel, its backward mode, and cross-block chain fusion.
    # None -> import-time defaults (models/layers.py).
    fused: bool | None = None
    bwd_mode: str | None = None
    chain: bool | None = None

    @nn.compact
    def __call__(self, inp_img):
        d = self.dim
        kw = dict(ffn_expansion_factor=self.ffn_expansion_factor,
                  use_bias=self.bias, ln_type=self.ln_type, dtype=self.dtype,
                  fused=self.fused, bwd_mode=self.bwd_mode)

        def blocks(dim, heads, n, name):
            def run(x):
                return tblock_stage(x, dim, heads, n, name, chain=self.chain,
                                    **kw)
            return run

        b, h0, w0, _ = inp_img.shape
        x = pad_to_multiple(inp_img, 8)

        inp_enc1 = OverlapPatchEmbed(d, self.bias, self.dtype,
                                     name="patch_embed")(x)
        out_enc1 = blocks(d, self.heads[0], self.num_blocks[0],
                          "encoder_level1")(inp_enc1)

        inp_enc2 = Downsample(d, self.dtype, name="down1_2")(out_enc1)
        out_enc2 = blocks(d * 2, self.heads[1], self.num_blocks[1],
                          "encoder_level2")(inp_enc2)

        inp_enc3 = Downsample(d * 2, self.dtype, name="down2_3")(out_enc2)
        out_enc3 = blocks(d * 4, self.heads[2], self.num_blocks[2],
                          "encoder_level3")(inp_enc3)

        inp_enc4 = Downsample(d * 4, self.dtype, name="down3_4")(out_enc3)
        latent = blocks(d * 8, self.heads[3], self.num_blocks[3],
                        "latent")(inp_enc4)

        x = Upsample(d * 8, self.dtype, name="up4_3")(latent)
        x = jnp.concatenate([x, out_enc3], axis=-1)
        x = nn.Conv(d * 4, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level3")(x)
        x = blocks(d * 4, self.heads[2], self.num_blocks[2],
                   "decoder_level3")(x)

        x = Upsample(d * 4, self.dtype, name="up3_2")(x)
        x = jnp.concatenate([x, out_enc2], axis=-1)
        x = nn.Conv(d * 2, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level2")(x)
        x = blocks(d * 2, self.heads[1], self.num_blocks[1],
                   "decoder_level2")(x)

        x = Upsample(d * 2, self.dtype, name="up2_1")(x)
        x = jnp.concatenate([x, out_enc1], axis=-1)
        x = blocks(d * 2, self.heads[0], self.num_blocks[0],
                   "decoder_level1")(x)
        x = blocks(d * 2, self.heads[0], self.num_refinement_blocks,
                   "refinement")(x)

        if self.dual_pixel_task:
            x = x + nn.Conv(d * 2, (1, 1), use_bias=self.bias,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="skip_conv")(inp_enc1)
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=self.bias, dtype=self.dtype,
                          param_dtype=jnp.float32, name="output")(x)
        else:
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=self.bias, dtype=self.dtype,
                          param_dtype=jnp.float32, name="output")(x)
            out = out + x_residual_cast(inp_img, out, h0, w0)
            return out[:, :h0, :w0]
        return out[:, :h0, :w0]


def x_residual_cast(inp_img, out, h0, w0):
    """Residual add of the (padded) input, matching padded spatial dims."""
    pad_h = out.shape[1] - h0
    pad_w = out.shape[2] - w0
    if pad_h or pad_w:
        inp_img = jnp.pad(inp_img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return inp_img.astype(out.dtype)


class RestormerRefFusion(nn.Module):
    """Restormer trunk + MASA warp pyramid injected at every encoder level
    via TransformerResFusionBlocks (reference :504-964)."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    ln_type: str = "WithBias"
    dual_pixel_task: bool = False
    # MASA params (reference :517-526)
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
    # kernel selection (explicit, not process state) — see Restormer
    fused: bool | None = None
    bwd_mode: str | None = None
    chain: bool | None = None

    @nn.compact
    def __call__(self, inp_img, ref_img):
        d = self.dim
        kw = dict(ffn_expansion_factor=self.ffn_expansion_factor,
                  use_bias=self.bias, ln_type=self.ln_type, dtype=self.dtype,
                  fused=self.fused, bwd_mode=self.bwd_mode)

        b, h0, w0, _ = inp_img.shape
        pad = 8 * self.lr_block_size
        inp = pad_to_multiple(inp_img, pad)
        ref = pad_to_multiple(ref_img, pad)

        # MASA: 4-level pyramid (deepest stride 8), warp scales x1..x8.
        # The encoder is named masa_enc at the top level so reference
        # checkpoints (masa_enc.conv_L1. ...) convert mechanically.
        enc = MASAEncoder(self.nf, self.ext_n_blocks, 4, self.dtype,
                          name="masa_enc")
        # one batched tower pass over [lq; ref] when shapes match (training),
        # two shared-param passes otherwise (whole-image eval, full-size ref)
        feat_lq, feat_ref = masa_encode_pair(enc, inp, ref)
        warp = masa_match_and_warp(
            feat_lq[-1], feat_ref,
            lr_block_size=self.lr_block_size,
            ref_down_block_size=self.ref_down_block_size,
            psize=self.psize, dilations=tuple(self.dilations),
        )
        # warp: shallow->deep [(.., nf@1), (.., 2nf@1/2), (.., 4nf@1/4),
        # (.., 8nf@1/8)] — matches trunk level dims when nf == dim.

        def blocks(dim, heads, n, name):
            def run(x):
                return tblock_stage(x, dim, heads, n, name, chain=self.chain,
                                    **kw)
            return run

        def fuse(x, warp_l, heads, n, name):
            cat = jnp.concatenate([x, warp_l.astype(x.dtype)], axis=-1)
            dim2 = cat.shape[-1]
            for i in range(n):
                cat = TransformerResFusionBlock(dim2, heads, **kw,
                                                name=f"{name}_{i}")(cat)
            return cat[..., : dim2 // 2]

        x = OverlapPatchEmbed(d, self.bias, self.dtype, name="patch_embed")(inp)

        x = fuse(x, warp[0], self.heads[0], self.reffusion_n_blocks[0],
                 "masa_blk_enc_level1")
        inp_enc1 = x  # fused level-1 input (dual-pixel skip source)
        out_enc1 = blocks(d, self.heads[0], self.num_blocks[0],
                          "encoder_level1")(x)

        x = Downsample(d, self.dtype, name="down1_2")(out_enc1)
        x = fuse(x, warp[1], self.heads[1], self.reffusion_n_blocks[1],
                 "masa_blk_enc_level2")
        out_enc2 = blocks(d * 2, self.heads[1], self.num_blocks[1],
                          "encoder_level2")(x)

        x = Downsample(d * 2, self.dtype, name="down2_3")(out_enc2)
        x = fuse(x, warp[2], self.heads[2], self.reffusion_n_blocks[2],
                 "masa_blk_enc_level3")
        out_enc3 = blocks(d * 4, self.heads[2], self.num_blocks[2],
                          "encoder_level3")(x)

        x = Downsample(d * 4, self.dtype, name="down3_4")(out_enc3)
        x = fuse(x, warp[3], self.heads[3], self.reffusion_n_blocks[3],
                 "masa_blk_enc_level4")
        latent = blocks(d * 8, self.heads[3], self.num_blocks[3],
                        "latent")(x)

        x = Upsample(d * 8, self.dtype, name="up4_3")(latent)
        x = jnp.concatenate([x, out_enc3], axis=-1)
        x = nn.Conv(d * 4, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level3")(x)
        x = blocks(d * 4, self.heads[2], self.num_blocks[2],
                   "decoder_level3")(x)

        x = Upsample(d * 4, self.dtype, name="up3_2")(x)
        x = jnp.concatenate([x, out_enc2], axis=-1)
        x = nn.Conv(d * 2, (1, 1), use_bias=self.bias, dtype=self.dtype,
                    param_dtype=jnp.float32, name="reduce_chan_level2")(x)
        x = blocks(d * 2, self.heads[1], self.num_blocks[1],
                   "decoder_level2")(x)

        x = Upsample(d * 2, self.dtype, name="up2_1")(x)
        x = jnp.concatenate([x, out_enc1], axis=-1)
        x = blocks(d * 2, self.heads[0], self.num_blocks[0],
                   "decoder_level1")(x)
        x = blocks(d * 2, self.heads[0], self.num_refinement_blocks,
                   "refinement")(x)

        if self.dual_pixel_task:
            # skip connection from the fused level-1 input
            # (reference :956-960)
            x = x + nn.Conv(d * 2, (1, 1), use_bias=self.bias,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="skip_conv")(inp_enc1)
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=self.bias, dtype=self.dtype,
                          param_dtype=jnp.float32, name="output")(x)
        else:
            out = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=self.bias, dtype=self.dtype,
                          param_dtype=jnp.float32, name="output")(x)
            out = out + inp.astype(out.dtype)
        return out[:, :h0, :w0]
