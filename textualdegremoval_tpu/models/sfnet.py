"""SFNet (+RefFusion) in Flax (NHWC) — frequency-selection MIMO U-Net.

Parity target: reference models/archs/network_sfnet_guided_arch.py +
sfnet_arch_utils.py.  The reference SFNet-guided file was never exercised and
ships several defects (SURVEY.md §2.5.2); this implementation realizes the
evident intent:

* 3-level MASA pyramid (deepest stride 4 == trunk padder), channels doubling
  per level (the shipped 3-level Encoder forgets to widen its convs);
* EBlockResFusion actually calls its layers:
  out = blocks(cat([x, warp])) * alpha + cat, sliced back to x's channels;
* the three fusion blocks are used at their own levels (the shipped forward
  reuses level2 at level3);
* outputs is a list of 3 scales (the shipped final index `[:, :, H, W]` on a
  list cannot run).

TLC (test-time) pooling follows sfnet_arch_utils.AvgPool2d: kernel =
feature_extent * base_size // 256 with Indoor=246 / Outdoor=210 base sizes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.models.layers import MASAEncoder, masa_encode_pair
from textualdegremoval_tpu.ops import pad_to_multiple, masa_match_and_warp
from textualdegremoval_tpu.ops.tlc import local_avg_pool
from textualdegremoval_tpu.ops.masa import unfold_nhwc

TRAIN_SIZE = 256  # sfnet_arch_utils.py:8 global


def _pool(x, tlc_base):
    """Global mean at train; TLC local box pool at test."""
    if tlc_base is None:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    k = (x.shape[1] * tlc_base // TRAIN_SIZE, x.shape[2] * tlc_base // TRAIN_SIZE)
    return local_avg_pool(x, k)


class BasicConv(nn.Module):
    out_channel: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = True  # actually GELU (reference BasicConv uses nn.GELU)
    transpose: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.transpose:
            x = nn.ConvTranspose(
                self.out_channel, (k, k), strides=(self.stride, self.stride),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                use_bias=self.use_bias, dtype=self.dtype,
                param_dtype=jnp.float32, name="conv")(x)
        else:
            x = nn.Conv(self.out_channel, (k, k),
                        strides=(self.stride, self.stride), padding=k // 2,
                        use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
        if self.relu:
            x = jax.nn.gelu(x, approximate=False)
        return x


class Gap(nn.Module):
    """Global/low-freq vs high-freq re-weighting (sfnet_arch_utils.py:100-118)."""

    dim: int
    tlc_base: int | None = None

    @nn.compact
    def __call__(self, x):
        fscale_d = self.param("fscale_d", nn.initializers.zeros, (self.dim,))
        fscale_h = self.param("fscale_h", nn.initializers.zeros, (self.dim,))
        x_d = _pool(x, self.tlc_base)
        x_h = (x - x_d) * (fscale_h.astype(x.dtype) + 1.0)
        return x_d * fscale_d.astype(x.dtype) + x_h


class PatchAP(nn.Module):
    """Patch-statistics re-weighting (sfnet_arch_utils.py:239-264)."""

    dim: int
    patch_size: int = 2
    tlc_base: int | None = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        ch = self.dim * p * p
        hparam = self.param("h", nn.initializers.zeros, (ch,))
        lparam = self.param("l", nn.initializers.zeros, (ch,))
        b, H, W, c = x.shape
        # 'b c (p1 w1) (p2 w2) -> b (c p1 p2) w1 w2' in NHWC
        w1, w2 = H // p, W // p
        px = x.reshape(b, p, w1, p, w2, c)
        px = px.transpose(0, 2, 4, 5, 1, 3).reshape(b, w1, w2, c * p * p)
        low = _pool(px, self.tlc_base)
        high = (px - low) * hparam.astype(x.dtype)
        out = high + low * lparam.astype(x.dtype)
        out = out.reshape(b, w1, w2, c, p, p).transpose(0, 4, 1, 5, 2, 3)
        return out.reshape(b, H, W, c)


class SFconv(nn.Module):
    """Frequency re-weighting (sfnet_arch_utils.py:194-236)."""

    dim: int
    tlc_base: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, low, high):
        d = max(self.dim // 2, 32)
        emerge = _pool(low + high, self.tlc_base)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        fea_z = nn.Conv(d, (1, 1), name="fc", **kw)(emerge)
        high_att = nn.Conv(self.dim, (1, 1), name="fcs_0", **kw)(fea_z)
        low_att = nn.Conv(self.dim, (1, 1), name="fcs_1", **kw)(fea_z)
        # NB: the reference normalizes the softmax over the ENTIRE
        # concatenated 2C channel axis (sfnet_arch_utils.py:227-229,
        # nn.Softmax(dim=1) on cat([high, low])), NOT pairwise per channel
        # as in SK-Net — trained SFNet checkpoints depend on this.
        att = jax.nn.softmax(
            jnp.concatenate([high_att, low_att], axis=-1), axis=-1)
        high_att, low_att = jnp.split(att, 2, axis=-1)
        out = high * high_att + low * low_att
        return nn.Conv(self.dim, (1, 1), name="out", **kw)(out)


class DynamicFilter(nn.Module):
    """Predicted low-pass filter + high-pass residual modulation
    (sfnet_arch_utils.py:152-191)."""

    dim: int
    kernel_size: int = 3
    group: int = 8
    tlc_base: int | None = None
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        ks = self.kernel_size
        group = min(self.group, c)  # tiny configs: group must divide c
        filt = _pool(x, None)  # reference uses plain GAP here
        filt = nn.Conv(group * ks * ks, (1, 1), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(filt)
        filt = nn.BatchNorm(use_running_average=self.use_running_average,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="bn")(filt)
        # softmax over kernel positions
        filt = filt.reshape(n, 1, 1, group, ks * ks)
        filt = jax.nn.softmax(filt, axis=-1)

        xp = jnp.pad(x, ((0, 0), (ks // 2, ks // 2), (ks // 2, ks // 2),
                         (0, 0)), mode="reflect")
        patches = unfold_nhwc(xp, ks)  # (n, h, w, c*ks*ks) channel-major
        patches = patches.reshape(n, h, w, group, c // group, ks * ks)
        low = jnp.sum(
            patches * filt[:, :, :, :, None, :].astype(patches.dtype), axis=-1)
        low = low.reshape(n, h, w, c)
        high = x - low
        return SFconv(self.dim, self.tlc_base, self.dtype, name="modulate")(
            low, high)


class SFResBlock(nn.Module):
    """ResBlock with optional frequency filtering
    (sfnet_arch_utils.py:121-149)."""

    dim: int
    use_filter: bool = False
    tlc_base: int | None = None
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        out = BasicConv(self.dim, 3, 1, relu=True, dtype=self.dtype,
                        name="conv1")(x)
        half = self.dim // 2
        if self.use_filter:
            k3, k5 = jnp.split(out, 2, axis=-1)
            k3 = DynamicFilter(half, 3, tlc_base=self.tlc_base,
                               dtype=self.dtype,
                               use_running_average=self.use_running_average,
                               name="dyna")(k3)
            k5 = DynamicFilter(half, 5, tlc_base=self.tlc_base,
                               dtype=self.dtype,
                               use_running_average=self.use_running_average,
                               name="dyna_2")(k5)
            out = jnp.concatenate([k3, k5], axis=-1)
        non_local, local = jnp.split(out, 2, axis=-1)
        non_local = Gap(half, self.tlc_base, name="global_ap")(non_local)
        local = PatchAP(half, 2, self.tlc_base, name="localap")(local)
        out = jnp.concatenate([non_local, local], axis=-1)
        out = BasicConv(self.dim, 3, 1, relu=False, dtype=self.dtype,
                        name="conv2")(out)
        return out + x


class EBlock(nn.Module):
    dim: int
    num_res: int
    tlc_base: int | None = None
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_res - 1):
            x = SFResBlock(self.dim, False, self.tlc_base, self.dtype,
                           self.use_running_average, name=f"layers_{i}")(x)
        return SFResBlock(self.dim, True, self.tlc_base, self.dtype,
                          self.use_running_average,
                          name=f"layers_{self.num_res - 1}")(x)


class SCM(nn.Module):
    """Shallow conv module + InstanceNorm (reference :200-214)."""

    out_plane: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.out_plane
        x = BasicConv(p // 4, 3, 1, True, dtype=self.dtype, name="main_0")(x)
        x = BasicConv(p // 2, 1, 1, True, dtype=self.dtype, name="main_1")(x)
        x = BasicConv(p // 2, 3, 1, True, dtype=self.dtype, name="main_2")(x)
        x = BasicConv(p, 1, 1, False, dtype=self.dtype, name="main_3")(x)
        return nn.GroupNorm(num_groups=p, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="norm")(x)


class EBlockResFusion(nn.Module):
    """Fusion stage: blocks over cat([x, warp]) with zero-init alpha gate,
    sliced back (reference EBlockResFusion, intended semantics)."""

    dim: int
    num_res: int
    tlc_base: int | None = None
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, cat):
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        out = cat
        n = max(self.num_res, 1)
        for i in range(n):
            out = SFResBlock(self.dim, i == n - 1, self.tlc_base, self.dtype,
                             self.use_running_average,
                             name=f"layers_{i}")(out)
        return out * alpha.astype(cat.dtype) + cat


def _sfnet_body(self, x, warp=None):
    """Shared MIMO trunk executed in the caller's compact scope (top-level
    parameter names for mechanical checkpoint mapping); `warp` enables
    RefFusion injection."""
    if True:
        bc = self.base_channel
        kw = dict(tlc_base=self.tlc_base, dtype=self.dtype,
                  use_running_average=self.use_running_average)
        b, H, W, _ = x.shape
        # reference F.interpolate(scale_factor=0.5) default mode is NEAREST,
        # which at exactly 0.5 picks the even-index pixels
        x_2 = x[:, ::2, ::2]
        x_4 = x_2[:, ::2, ::2]
        z2 = SCM(bc * 2, self.dtype, name="SCM2")(x_2)
        z4 = SCM(bc * 4, self.dtype, name="SCM1")(x_4)

        def fuse(z, warp_l, n, name):
            cat = jnp.concatenate([z, warp_l.astype(z.dtype)], axis=-1)
            dim2 = cat.shape[-1]
            out = EBlockResFusion(dim2, n, **kw, name=name)(cat)
            return out[..., : dim2 // 2]

        outputs = []
        x_ = BasicConv(bc, 3, 1, True, dtype=self.dtype,
                       name="feat_extract_0")(x)
        if warp is not None:
            x_ = fuse(x_, warp[0], self.reffusion_n_blocks[0],
                      "masa_blk_enc_level1")
        res1 = EBlock(bc, self.num_res, **kw, name="Encoder_0")(x_)

        z = BasicConv(bc * 2, 3, 2, True, dtype=self.dtype,
                      name="feat_extract_1")(res1)
        if warp is not None:
            z = fuse(z, warp[1], self.reffusion_n_blocks[1],
                     "masa_blk_enc_level2")
        z = BasicConv(bc * 2, 3, 1, False, dtype=self.dtype,
                      name="FAM2")(jnp.concatenate([z, z2], axis=-1))
        res2 = EBlock(bc * 2, self.num_res, **kw, name="Encoder_1")(z)

        z = BasicConv(bc * 4, 3, 2, True, dtype=self.dtype,
                      name="feat_extract_2")(res2)
        if warp is not None:
            z = fuse(z, warp[2], self.reffusion_n_blocks[2],
                     "masa_blk_enc_level3")
        z = BasicConv(bc * 4, 3, 1, False, dtype=self.dtype,
                      name="FAM1")(jnp.concatenate([z, z4], axis=-1))
        z = EBlock(bc * 4, self.num_res, **kw, name="Encoder_2")(z)

        z = EBlock(bc * 4, self.num_res, **kw, name="Decoder_0")(z)
        z_ = BasicConv(3, 3, 1, False, dtype=self.dtype, name="ConvsOut_0")(z)
        z = BasicConv(bc * 2, 4, 2, True, transpose=True, dtype=self.dtype,
                      name="feat_extract_3")(z)
        outputs.append(z_ + x_4.astype(z_.dtype))

        z = jnp.concatenate([z, res2], axis=-1)
        z = BasicConv(bc * 2, 1, 1, True, dtype=self.dtype, name="Convs_0")(z)
        z = EBlock(bc * 2, self.num_res, **kw, name="Decoder_1")(z)
        z_ = BasicConv(3, 3, 1, False, dtype=self.dtype, name="ConvsOut_1")(z)
        z = BasicConv(bc, 4, 2, True, transpose=True, dtype=self.dtype,
                      name="feat_extract_4")(z)
        outputs.append(z_ + x_2.astype(z_.dtype))

        z = jnp.concatenate([z, res1], axis=-1)
        z = BasicConv(bc, 1, 1, True, dtype=self.dtype, name="Convs_1")(z)
        z = EBlock(bc, self.num_res, **kw, name="Decoder_2")(z)
        z = BasicConv(3, 3, 1, False, dtype=self.dtype,
                      name="feat_extract_5")(z)
        outputs.append(z + x.astype(z.dtype))
        return outputs


class SFNet(nn.Module):
    num_res: int = 16
    base_channel: int = 32
    tlc_base: int | None = None  # None=train; 246 Indoor / 210 Outdoor
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        b, h0, w0, _ = x.shape
        xp = pad_to_multiple(x, 4)
        outs = _sfnet_body(self, xp)
        return [
            outs[0][:, : h0 // 4, : w0 // 4],
            outs[1][:, : h0 // 2, : w0 // 2],
            outs[2][:, :h0, :w0],
        ]


class SFNetRefFusion(nn.Module):
    num_res: int = 16
    base_channel: int = 32
    tlc_base: int | None = None
    nf: int = 32
    ext_n_blocks: Sequence[int] = (4, 4, 4)
    reffusion_n_blocks: Sequence[int] = (1, 1, 1)
    reffusion_n_blocks_middle: int = 1
    num_nbr: int = 1
    psize: int = 3
    lr_block_size: int = 8
    ref_down_block_size: float = 1.5
    dilations: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32
    use_running_average: bool = True

    @nn.compact
    def __call__(self, inp_img, ref_img):
        b, h0, w0, _ = inp_img.shape
        pad = 4 * self.lr_block_size
        inp = pad_to_multiple(inp_img, pad)
        ref = pad_to_multiple(ref_img, pad)
        enc = MASAEncoder(self.nf, self.ext_n_blocks, 3, self.dtype,
                          name="masa_enc")
        feat_lq, feat_ref = masa_encode_pair(enc, inp, ref)
        warp = masa_match_and_warp(
            feat_lq[-1], feat_ref,
            lr_block_size=self.lr_block_size,
            ref_down_block_size=self.ref_down_block_size,
            psize=self.psize, dilations=tuple(self.dilations),
        )
        outs = _sfnet_body(self, inp, warp)
        return [
            outs[0][:, : h0 // 4, : w0 // 4],
            outs[1][:, : h0 // 2, : w0 // 2],
            outs[2][:, :h0, :w0],
        ]
