"""NAFNet and NAFNetRefFusion in Flax (NHWC).

Parity target: reference models/archs/network_nafnet_guided_arch.py
(NAFNet :305-386, NAFNetRefFusion :389-740).  The Local (TLC) variants are
expressed as a constructor flag (`tlc_train_size`) instead of a module
rewriting pass: every SCA global pool becomes a box-filtered local pool with
kernel = 1.5 * train_size scaled by the test/train ratio
(nafnet_local_arch.py:10-111, 743-766).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.models.layers import NAFBlock, MASAEncoder, masa_encode_pair
from textualdegremoval_tpu.ops import pad_to_multiple, masa_match_and_warp
from textualdegremoval_tpu.ops.tlc import tlc_kernel_size


def _tlc_kernel(tlc_train_size, level_scale, x_shape):
    """Kernel for the SCA local pool at a given pyramid level, or None for
    global pooling (training / non-Local variants)."""
    if tlc_train_size is None:
        return None
    th, tw = tlc_train_size
    base = (int(th * 1.5) // level_scale, int(tw * 1.5) // level_scale)
    train = (th // level_scale, tw // level_scale)
    test = (x_shape[1], x_shape[2])
    return tlc_kernel_size(base, train, test)


class NAFNet(nn.Module):
    """Plain NAFNet U-Net."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    tlc_train_size: tuple[int, int] | None = None
    dtype: jnp.dtype = jnp.float32
    # fused whole-NAFBlock Pallas kernel (explicit, not process state);
    # None -> import-time default (models/layers.py)
    fused: bool | None = None

    @nn.compact
    def __call__(self, inp):
        b, h0, w0, _ = inp.shape
        padder = 2 ** len(self.enc_blk_nums)
        x_in = pad_to_multiple(inp, padder)

        x = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="intro")(x_in)

        encs = []
        chan = self.width
        scale = 1
        for li, num in enumerate(self.enc_blk_nums):
            tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
            for i in range(num):
                x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                             name=f"encoders_{li}_{i}")(x)
            encs.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"downs_{li}")(x)
            chan *= 2
            scale *= 2

        tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
        for i in range(self.middle_blk_num):
            x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                         name=f"middle_blks_{i}")(x)

        for li, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(chan * 2, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"ups_{li}")(x)
            from textualdegremoval_tpu.ops import pixel_shuffle
            x = pixel_shuffle(x, 2)
            chan //= 2
            scale //= 2
            x = x + encs[-(li + 1)]
            tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
            for i in range(num):
                x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                             name=f"decoders_{li}_{i}")(x)

        x = nn.Conv(self.img_channel, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="ending")(x)
        x = x + x_in.astype(x.dtype)
        return x[:, :h0, :w0]


class NAFNetRefFusion(nn.Module):
    """NAFNet trunk + 5-level MASA warp pyramid, fused at every encoder level
    and at the middle via NAFResFuse blocks (structurally NAFBlocks applied
    to cat([x, warp]) with the first half sliced back, reference :717-727)."""

    img_channel: int = 3
    width: int = 64
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = (1, 1, 1, 28)
    dec_blk_nums: Sequence[int] = (1, 1, 1, 1)
    nf: int = 64
    ext_n_blocks: Sequence[int] = (4, 4, 4, 4)
    reffusion_n_blocks: Sequence[int] = (1, 1, 1, 1, 1)
    reffusion_n_blocks_middle: int = 1
    num_nbr: int = 1
    psize: int = 3
    lr_block_size: int = 8
    ref_down_block_size: float = 1.5
    dilations: Sequence[int] = (1, 2, 3)
    tlc_train_size: tuple[int, int] | None = None
    dtype: jnp.dtype = jnp.float32
    # fused whole-NAFBlock Pallas kernel — see NAFNet
    fused: bool | None = None

    @nn.compact
    def __call__(self, inp, ref):
        b, h0, w0, _ = inp.shape
        n_levels = len(self.enc_blk_nums)  # trunk depth; masa pyramid = n+1
        padder = 2 ** n_levels
        pad = padder * self.lr_block_size
        x_in = pad_to_multiple(inp, pad)
        ref_in = pad_to_multiple(ref, pad)

        # 5-level pyramid: deepest stride 16 == trunk padder
        enc = MASAEncoder(self.nf, self.ext_n_blocks, n_levels + 1,
                          self.dtype, name="masa_enc")
        feat_lq, feat_ref = masa_encode_pair(enc, x_in, ref_in)
        warp = masa_match_and_warp(
            feat_lq[-1], feat_ref,
            lr_block_size=self.lr_block_size,
            ref_down_block_size=self.ref_down_block_size,
            psize=self.psize, dilations=tuple(self.dilations),
        )

        def fuse(x, warp_l, n, name, tk):
            cat = jnp.concatenate([x, warp_l.astype(x.dtype)], axis=-1)
            dim2 = cat.shape[-1]
            for i in range(n):
                cat = NAFBlock(dim2, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                               name=f"{name}_{i}")(cat)
            return cat[..., : dim2 // 2]

        x = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="intro")(x_in)

        encs = []
        chan = self.width
        scale = 1
        for li, num in enumerate(self.enc_blk_nums):
            tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
            x = fuse(x, warp[li], self.reffusion_n_blocks[li],
                     f"masa_blk_enc_{li}", tk)
            for i in range(num):
                x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                             name=f"encoders_{li}_{i}")(x)
            encs.append(x)
            x = nn.Conv(2 * chan, (2, 2), strides=(2, 2), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"downs_{li}")(x)
            chan *= 2
            scale *= 2

        # The reference indexes reffusion_n_blocks[n_levels] here, which is
        # out of range for every shipped config; the evidently intended knob
        # is reffusion_n_blocks_middle (SURVEY.md §2.5 family of defects).
        tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
        x = fuse(x, warp[-1], self.reffusion_n_blocks_middle,
                 "masa_blk_middle_0", tk)
        for i in range(self.middle_blk_num):
            x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                         name=f"middle_blks_{i}")(x)

        from textualdegremoval_tpu.ops import pixel_shuffle
        for li, num in enumerate(self.dec_blk_nums):
            x = nn.Conv(chan * 2, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"ups_{li}")(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            scale //= 2
            x = x + encs[-(li + 1)]
            tk = _tlc_kernel(self.tlc_train_size, scale, x.shape)
            for i in range(num):
                x = NAFBlock(chan, tlc_kernel=tk, dtype=self.dtype, fused=self.fused,
                             name=f"decoders_{li}_{i}")(x)

        x = nn.Conv(self.img_channel, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="ending")(x)
        x = x + x_in.astype(x.dtype)
        return x[:, :h0, :w0]
