"""Shared Flax layers for the restoration backbones (NHWC).

Module/parameter names deliberately mirror the reference's torch module names
so the PyTorch->Orbax checkpoint converter is a mechanical key mapping
(see textualdegremoval_tpu/convert/).

Parity targets are cited per class (semantics re-derived, not translated).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from textualdegremoval_tpu.ops import (
    bias_free_layer_norm,
    with_bias_layer_norm,
    layer_norm_2d,
    pixel_shuffle,
    pixel_unshuffle,
    simple_gate,
    masa_match_and_warp,
)
from textualdegremoval_tpu.ops.attention import mdta_attention_nhwc
from textualdegremoval_tpu.ops.tlc import local_avg_pool


def _env_on(name: str, default: str = "0") -> bool:
    return os.environ.get(name, default) in ("1", "true", "on")


# Process-wide DEFAULTS for the kernel-selection knobs, resolved ONCE at
# import from the environment (the CLI-entry override surface).  Kernel
# selection itself is an explicit module attribute (fused / bwd_mode /
# chain / impl) so two models with different settings coexist in one
# process and jit cache keys stay sound — library code never reads env at
# trace time and never writes os.environ.
#
# The whole-TransformerBlock kernel's default is genuinely *auto*: with
# $TDR_FUSED_TBLOCK unset, fused resolves ON iff the backend is TPU (it is
# the measured-fastest AND memory-feasible path there — BENCH_NOTES.md:
# 9.4 vs 6.6 img/s forward, and the XLA op chain OOMs the 384 px training
# protocol).  The env var remains an explicit override either way; the
# backend query is deterministic per process, so jit cache keys stay sound.
_FUSED_TBLOCK_ENV = os.environ.get("TDR_FUSED_TBLOCK")


def _fused_tblock_default() -> bool:
    """Resolution of fused=None for TransformerBlock-family modules:
    explicit $TDR_FUSED_TBLOCK wins; otherwise ON exactly when the default
    backend is TPU (where ops/pallas/tblock.py applies; unsupported shapes
    still fall back to the identical-math tblock_ref inside the op)."""
    if _FUSED_TBLOCK_ENV is not None:
        return _FUSED_TBLOCK_ENV in ("1", "true", "on")
    return jax.default_backend() == "tpu"


_FUSED_TBLOCK_CHAIN_DEFAULT = _env_on("TDR_FUSED_TBLOCK_CHAIN")
_FUSED_GDFN_DEFAULT = _env_on("TDR_FUSED_GDFN")
_FUSED_NAFBLOCK_DEFAULT = _env_on("TDR_FUSED_NAFBLOCK")
_TBLOCK_BWD_DEFAULT = os.environ.get("TDR_TBLOCK_BWD", "save")
_DWCONV_DEFAULT = os.environ.get("TDR_DWCONV", "conv")
_CONVGRAD_DEFAULT = os.environ.get("TDR_CONVGRAD", "shift")


class ChannelLayerNorm(nn.Module):
    """Restormer LayerNorm (network_restormer_guided_arch.py:172-218)."""

    dim: int
    ln_type: str = "WithBias"  # or "BiasFree"

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        if self.ln_type == "BiasFree":
            return bias_free_layer_norm(x, weight)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return with_bias_layer_norm(x, weight, bias)


class LayerNorm2d(nn.Module):
    """NAFNet LayerNorm2d (nafnet_arch_utils.py:264-300), eps=1e-6."""

    dim: int

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm_2d(x, weight, bias)


class DWConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (K, K), feature_group_count=
    features)``: identical parameters (HWIO kernel (K, K, 1, C), optional
    bias, same init), but computed as K^2 shifted FMAs (ops.dwconv) — on
    TPU the depthwise conv emitter's relayout copies were the single
    largest avoidable traffic source in the flagship (BENCH_NOTES.md)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str | None = None  # 'shift' | 'conv' | None -> import-time default

    @nn.compact
    def __call__(self, x):
        impl = self.impl if self.impl is not None else _DWCONV_DEFAULT
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, 1, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        if impl == "shift":
            from textualdegremoval_tpu.ops.dwconv import dwconv_shift

            return dwconv_shift(x.astype(self.dtype), kernel, bias)
        # conv-emitter forward, shift-form custom_vjp backward (4x-faster
        # filter grads — ops/dwconv.py, BENCH_NOTES.md round 3)
        from textualdegremoval_tpu.ops.dwconv import dwconv_grad_shift

        y = dwconv_grad_shift(x.astype(self.dtype), kernel)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class MDTAAttention(nn.Module):
    """MDTA transposed channel attention
    (network_restormer_guided_arch.py:246-277).

    use_pallas: route the gram/softmax core through the fused Pallas
    streaming kernel (ops.pallas.mdta) — bit-identical to the XLA path on
    TPU; interpret-mode on CPU is slow, so the default only enables it on
    TPU backends."""

    dim: int
    num_heads: int
    use_bias: bool = False
    use_pallas: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        heads = self.num_heads
        temperature = self.param(
            "temperature", nn.initializers.ones, (heads, 1, 1)
        )
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=self.use_bias,
                      dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = DWConv(self.dim * 3, 3, self.use_bias, self.dtype,
                     name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        use_pallas = self.use_pallas
        if use_pallas is None:
            # Default OFF after measurement: the fused kernel is
            # bit-identical and compiles for heads==1 (heads>1 trips a
            # Mosaic lane-offset-slice limitation), but in the full model
            # it measures ~2x slower than the XLA path — pallas_call acts
            # as a fusion barrier around the qkv convs, which costs more
            # than the one-pass statistics save.  Kept for
            # standalone/experimental use.
            use_pallas = False
        if use_pallas:
            from textualdegremoval_tpu.ops.pallas import mdta_attention_pallas

            out = mdta_attention_pallas(q, k, v, temperature, heads)
        else:
            out = mdta_attention_nhwc(q, k, v, temperature, heads)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="project_out")(out)


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder: matches nn.Conv's param name
    ('kernel'), shape convention (HWIO) and init (lecun_normal with
    fan_in = prod(shape[:-1])), so checkpoints convert identically whether
    the op runs as nn.Conv or as a fused Pallas kernel."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _ConvKB(nn.Module):
    """Bare conv kernel+bias parameter holder (names/shapes/init match
    nn.Conv with use_bias=True, so fused-kernel checkpoints are
    interchangeable)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],), jnp.float32)
        return k, b


class _LN2dParams(nn.Module):
    """Bare LayerNorm2d parameter holder (names match LayerNorm2d)."""

    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class _SCAParams(nn.Module):
    """Bare SCA parameter holder (nested 'conv' scope matches SCA)."""

    dim: int

    @nn.compact
    def __call__(self):
        return _ConvKB((1, 1, self.dim, self.dim), name="conv")()


class GDFN(nn.Module):
    """Gated-dconv FFN (network_restormer_guided_arch.py:223-241).

    fused: run project_in + dwconv + gate + project_out as one Pallas
    streaming kernel (ops/pallas/gdfn.py) — the hidden (2*2.66*C wide)
    tensor never touches HBM.  Measured 3.3x faster than the XLA op chain
    at dim 96 / 512 px on v5e (BENCH_NOTES.md).  Auto (None): on for
    bias-free configs on TPU; off elsewhere (CPU falls back to the
    identical-math jnp path only under explicit fused=True).
    """

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool | None = None

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.ffn_expansion_factor)
        fused = self.fused
        if fused is None:
            # Default OFF after measurement (BENCH_NOTES.md round 2): the
            # fused kernel is 3.3x faster than the GDFN op chain in
            # isolation and cuts model HBM traffic 126->102 GB, but
            # in-model it serializes VPU depthwise work that XLA overlaps
            # with neighboring ops — net -4% end to end.  Enable with
            # fused=True (or TDR_FUSED_GDFN=1 before import) to re-evaluate
            # on toolchains where pallas_call composes better.
            fused = _FUSED_GDFN_DEFAULT
        if fused and not self.use_bias:
            from textualdegremoval_tpu.ops.pallas.gdfn import (
                gdfn_fused, gdfn_ref)

            c = x.shape[-1]
            w1 = _ConvKernel((1, 1, c, hidden * 2), name="project_in")()
            dwk = _ConvKernel((3, 3, 1, hidden * 2), name="dwconv")()
            w2 = _ConvKernel((1, 1, hidden, self.dim), name="project_out")()
            w1 = w1.reshape(c, hidden * 2)
            dwk = dwk.reshape(3, 3, hidden * 2)
            w2 = w2.reshape(hidden, self.dim)
            xd = x.astype(self.dtype)
            if jax.default_backend() == "tpu":
                return gdfn_fused(xd, w1, dwk, w2)
            return gdfn_ref(xd, w1, dwk, w2)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="project_in")(x)
        x = DWConv(hidden * 2, 3, self.use_bias, self.dtype,
                   name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = jax.nn.gelu(x1, approximate=False) * x2
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="project_out")(x)


class _LNParams(nn.Module):
    """Bare ChannelLayerNorm parameter holder (same names/shapes/init as
    ChannelLayerNorm, so fused-kernel checkpoints are interchangeable)."""

    dim: int
    ln_type: str = "WithBias"

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = (None if self.ln_type == "BiasFree"
             else self.param("bias", nn.initializers.zeros, (self.dim,)))
        return w, b


class _MDTAParams(nn.Module):
    """Bare MDTAAttention parameter holder (names match MDTAAttention)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        qkv = _ConvKernel((1, 1, self.dim, self.dim * 3), name="qkv")()
        qkv_dw = _ConvKernel((3, 3, 1, self.dim * 3), name="qkv_dwconv")()
        proj = _ConvKernel((1, 1, self.dim, self.dim), name="project_out")()
        return dict(temperature=temperature, qkv=qkv, qkv_dw=qkv_dw,
                    proj=proj)


class _GDFNParams(nn.Module):
    """Bare GDFN parameter holder (names match GDFN's module path)."""

    dim: int
    ffn_expansion_factor: float = 2.66

    @nn.compact
    def __call__(self):
        hidden = int(self.dim * self.ffn_expansion_factor)
        gd_in = _ConvKernel((1, 1, self.dim, hidden * 2),
                            name="project_in")()
        gd_dw = _ConvKernel((3, 3, 1, hidden * 2), name="dwconv")()
        gd_out = _ConvKernel((1, 1, hidden, self.dim), name="project_out")()
        return dict(gd_in=gd_in, gd_dw=gd_dw, gd_out=gd_out)


class _TBlockParamBundle(nn.Module):
    """All parameters of one TransformerBlock as a natural-shape dict
    (scope/param names identical to TransformerBlock, so checkpoints are
    interchangeable with both the module path and the fused kernel)."""

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    ln_type: str = "WithBias"

    @nn.compact
    def __call__(self):
        w1, b1 = _LNParams(self.dim, self.ln_type, name="norm1")()
        attn_p = _MDTAParams(self.dim, self.num_heads, name="attn")()
        w2, b2 = _LNParams(self.dim, self.ln_type, name="norm2")()
        ffn_p = _GDFNParams(self.dim, self.ffn_expansion_factor,
                            name="ffn")()
        p = dict(norm1_w=w1, norm2_w=w2, **attn_p, **ffn_p)
        if b1 is not None:
            p["norm1_b"] = b1
            p["norm2_b"] = b2
        return p


def tblock_stage(x, dim, num_heads, n, name, *, ffn_expansion_factor=2.66,
                 use_bias=False, ln_type="WithBias", dtype=jnp.float32,
                 fused=None, bwd_mode=None, chain=None):
    """A sequence of n TransformerBlocks named ``{name}_{i}``.

    In chain-fused mode (chain=True; default from $TDR_FUSED_TBLOCK_CHAIN
    at import) the whole stage runs as the cross-block-fused Pallas chain
    (ops/pallas/tblock.py tblock_chain_fused): pass B of block i also
    accumulates block i+1's attention statistics, so each intermediate
    activation crosses HBM once.  Otherwise fused/bwd_mode select the
    per-block kernel (TransformerBlock attributes).  Parameter names/shapes
    are identical to all paths.  Must be called from a compact module
    context.
    """
    if chain is None:
        chain = _FUSED_TBLOCK_CHAIN_DEFAULT
    if not chain or use_bias or n == 0:
        for i in range(n):
            x = TransformerBlock(
                dim, num_heads, ffn_expansion_factor=ffn_expansion_factor,
                use_bias=use_bias, ln_type=ln_type, dtype=dtype,
                fused=fused, bwd_mode=bwd_mode, name=f"{name}_{i}")(x)
        return x
    from textualdegremoval_tpu.ops.pallas.tblock import (
        tblock_chain_fused, tblock_ref)

    ps = tuple(
        _TBlockParamBundle(dim, num_heads, ffn_expansion_factor, ln_type,
                           name=f"{name}_{i}")()
        for i in range(n))
    xd = x.astype(dtype)
    if jax.default_backend() == "tpu":
        return tblock_chain_fused(xd, ps, num_heads, ln_type)
    for p in ps:
        xd = tblock_ref(xd, p, num_heads, ln_type)
    return xd


class TransformerBlock(nn.Module):
    """Restormer block (network_restormer_guided_arch.py:318-331).

    fused: run the ENTIRE block (LN1+qkv+dwconv+attention+project+LN2+GDFN
    +residuals) as the two-pass streaming Pallas kernel
    (ops/pallas/tblock.py).  Unlike the per-op kernels (which measurably
    lose to XLA overlap — BENCH_NOTES.md), the whole-block kernel leaves
    nothing around it to overlap with.  Auto (None): the import-time
    default (from $TDR_FUSED_TBLOCK).  bwd_mode ('save' | 'remat', see
    ops/pallas/tblock.py tblock_fused) picks the fused kernel's backward.
    Parameter names/shapes are identical in both paths, so checkpoints are
    interchangeable."""

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dtype: jnp.dtype = jnp.float32
    fused: bool | None = None
    bwd_mode: str | None = None

    @nn.compact
    def __call__(self, x):
        fused = (self.fused if self.fused is not None
                 else _fused_tblock_default())
        bwd_mode = (self.bwd_mode if self.bwd_mode is not None
                    else _TBLOCK_BWD_DEFAULT)
        if fused and not self.use_bias:
            from textualdegremoval_tpu.ops.pallas.tblock import (
                tblock_fused, tblock_ref)

            w1, b1 = _LNParams(self.dim, self.ln_type, name="norm1")()
            attn_p = _MDTAParams(self.dim, self.num_heads, name="attn")()
            w2, b2 = _LNParams(self.dim, self.ln_type, name="norm2")()
            ffn_p = _GDFNParams(self.dim, self.ffn_expansion_factor,
                                name="ffn")()
            p = dict(norm1_w=w1, norm2_w=w2, **attn_p, **ffn_p)
            if b1 is not None:
                p["norm1_b"] = b1
                p["norm2_b"] = b2
            xd = x.astype(self.dtype)
            if jax.default_backend() == "tpu":
                return tblock_fused(xd, p, self.num_heads, self.ln_type,
                                    bwd_mode)
            return tblock_ref(xd, p, self.num_heads, self.ln_type)
        x = x + MDTAAttention(self.dim, self.num_heads, self.use_bias,
                              dtype=self.dtype, name="attn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm1")(x))
        x = x + GDFN(self.dim, self.ffn_expansion_factor, self.use_bias,
                     self.dtype, name="ffn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm2")(x))
        return x


class TransformerResFusionBlock(nn.Module):
    """Fusion block with zero-init scalar gate
    (network_restormer_guided_arch.py:334-353): out = block(x)*alpha + x.
    The inner chain shares TransformerBlock's fused whole-block Pallas
    path (the alpha gate is a cheap epilogue XLA fuses into the kernel's
    output read)."""

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    ln_type: str = "WithBias"
    dtype: jnp.dtype = jnp.float32
    fused: bool | None = None
    bwd_mode: str | None = None

    @nn.compact
    def __call__(self, x):
        fused = (self.fused if self.fused is not None
                 else _fused_tblock_default())
        bwd_mode = (self.bwd_mode if self.bwd_mode is not None
                    else _TBLOCK_BWD_DEFAULT)
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        shortcut = x
        if fused and not self.use_bias:
            from textualdegremoval_tpu.ops.pallas.tblock import (
                tblock_fused, tblock_ref)

            w1, b1 = _LNParams(self.dim, self.ln_type, name="norm1")()
            attn_p = _MDTAParams(self.dim, self.num_heads, name="attn")()
            w2, b2 = _LNParams(self.dim, self.ln_type, name="norm2")()
            ffn_p = _GDFNParams(self.dim, self.ffn_expansion_factor,
                                name="ffn")()
            p = dict(norm1_w=w1, norm2_w=w2, **attn_p, **ffn_p)
            if b1 is not None:
                p["norm1_b"] = b1
                p["norm2_b"] = b2
            xd = x.astype(self.dtype)
            if jax.default_backend() == "tpu":
                y = tblock_fused(xd, p, self.num_heads, self.ln_type,
                                 bwd_mode)
            else:
                y = tblock_ref(xd, p, self.num_heads, self.ln_type)
            return y * alpha.astype(y.dtype) + shortcut.astype(y.dtype)
        x = x + MDTAAttention(self.dim, self.num_heads, self.use_bias,
                              dtype=self.dtype, name="attn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm1")(x))
        x = x + GDFN(self.dim, self.ffn_expansion_factor, self.use_bias,
                     self.dtype, name="ffn")(
            ChannelLayerNorm(self.dim, self.ln_type, name="norm2")(x))
        return x * alpha.astype(x.dtype) + shortcut


class OverlapPatchEmbed(nn.Module):
    """3x3 conv embed (network_restormer_guided_arch.py:358-367)."""

    embed_dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.embed_dim, (3, 3), padding=1, use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32, name="proj")(x)


class Downsample(nn.Module):
    """conv C->C/2 + PixelUnshuffle(2) -> 2C at half res
    (network_restormer_guided_arch.py:372-380)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_feat // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """conv C->2C + PixelShuffle(2) -> C/2 at double res
    (network_restormer_guided_arch.py:383-391)."""

    n_feat: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.n_feat * 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        return pixel_shuffle(x, 2)


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), strides, padding=1)``:
    identical parameters (HWIO ``kernel`` + ``bias``, same inits, so
    checkpoints interchange), but with ``impl='shift'`` the FILTER gradient
    is computed as 9 shifted MXU einsums (ops.convgrad.conv_grad_shift)
    instead of XLA's conv-emitter dW lowering.  Measured per shape on the
    chip (tools/bench_conv_grad.py): stride-1 encoder shapes win up to
    1.2x (48ch @384px); STRIDED shapes lose badly (0.52x at 48->96 s2), so
    strided instances always stay on the emitter regardless of impl."""

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    impl: str | None = None  # 'shift' | 'conv' | None -> import-time default

    @nn.compact
    def __call__(self, x):
        impl = self.impl if self.impl is not None else _CONVGRAD_DEFAULT
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        x = x.astype(self.dtype)
        if impl == "shift" and self.stride == 1:
            from textualdegremoval_tpu.ops.convgrad import conv_grad_shift

            y = conv_grad_shift(x, kernel, 1)
        else:
            p = ((1, 1), (1, 1))
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (self.stride, self.stride), p,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ResidualBlock(nn.Module):
    """conv-relu-conv + x (network_nafnet_guided_arch.py:44-59)."""

    nf: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = Conv3x3(self.nf, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = Conv3x3(self.nf, dtype=self.dtype, name="conv2")(out)
        return out + x


class MASAEncoder(nn.Module):
    """Multi-scale ResidualBlock feature extractor
    (network_nafnet_guided_arch.py:110-143, 4-level variant in the other
    guided archs).  Returns features shallow->deep, channels nf*2^level."""

    nf: int
    n_blocks: Sequence[int] = (4, 4, 4, 4)
    num_levels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for level in range(self.num_levels):
            ch = self.nf * (2 ** level)
            stride = 1 if level == 0 else 2
            x = Conv3x3(ch, stride=stride, dtype=self.dtype,
                        name=f"conv_L{level + 1}")(x)
            x = nn.relu(x)
            nblk = self.n_blocks[min(level, len(self.n_blocks) - 1)]
            for i in range(nblk):
                x = ResidualBlock(ch, self.dtype, name=f"blk_L{level + 1}_{i}")(x)
            feats.append(x)
        return feats


def masa_encode_pair(enc: MASAEncoder, inp, ref):
    """Run the shared MASA encoder over lq and ref.

    Same-shape inputs (training: ref is cropped to the lq shape) run as ONE
    batched tower pass — half the kernel launches, full MXU batch.  When the
    shapes differ (whole-image eval with a full-size reference, the
    reference's nonpad_test path, image_restoration_ref_model.py:299-316)
    the encoder runs twice sharing parameters, exactly like the reference's
    two masa_enc calls (network_nafnet_guided_arch.py:617-618).

    Returns (feat_lq_pyramid, feat_ref_pyramid), both shallow->deep.

    Dual-pixel: the 6-channel lqL+lqR input meets a 3-channel reference.
    The reference code ships broken here (masa_enc is built with
    in_chl=inp_channels=6 but Dataset_*_DualPixel_16bit yields a 3-channel
    ref — the ref pass cannot run, §2.5 defect family); the evident intent
    is realized by viewing the clean reference as identical left/right
    views (zero defocus disparity), so it flows through the same encoder.
    """
    if ref.shape[-1] * 2 == inp.shape[-1]:
        ref = jnp.concatenate([ref, ref], axis=-1)
    if inp.shape == ref.shape:
        feats = enc(jnp.concatenate([inp, ref], axis=0))
        b = inp.shape[0]
        return [f[:b] for f in feats], [f[b:] for f in feats]
    return enc(inp), enc(ref)


class MASAModule(nn.Module):
    """Shared-encoder MASA matcher: extracts pyramids from lq and ref and
    returns the warped ref pyramid (shallow->deep) aligned to lq.

    Composes MASAEncoder with ops.masa.masa_match_and_warp; fixes the
    reference's pyramid-index bug (SURVEY.md §2.5.1) by construction.
    """

    nf: int
    n_blocks: Sequence[int] = (4, 4, 4, 4)
    num_levels: int = 4
    lr_block_size: int = 8
    ref_down_block_size: float = 1.5
    psize: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lq, ref):
        enc = MASAEncoder(self.nf, self.n_blocks, self.num_levels,
                          self.dtype, name="masa_enc")
        feat_lq = enc(lq)
        feat_ref = enc(ref)
        return masa_match_and_warp(
            feat_lq[-1],
            feat_ref,
            lr_block_size=self.lr_block_size,
            ref_down_block_size=self.ref_down_block_size,
            psize=self.psize,
            dilations=tuple(self.dilations),
        )


# ---------------------------------------------------------------------------
# NAFNet blocks
# ---------------------------------------------------------------------------


class SCA(nn.Module):
    """Simplified channel attention: GAP (or TLC local pool) -> 1x1 conv ->
    scale (network_nafnet_guided_arch.py:192-196)."""

    dim: int
    tlc_kernel: tuple[int, int] | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.tlc_kernel is None:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            pooled = local_avg_pool(x, self.tlc_kernel)
        w = nn.Conv(self.dim, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(pooled)
        return x * w


class NAFBlock(nn.Module):
    """NAFNet block (network_nafnet_guided_arch.py:178-238).

    fused: run the ENTIRE block (LN1 + conv1 + dwconv + SimpleGate + SCA +
    conv3 + LN2 + pointwise FFN + residuals) as the two-pass streaming
    Pallas kernel (ops/pallas/nafblock.py) — same whole-block design that
    won in-model for TransformerBlock (BENCH_NOTES.md round 3).  Only for
    the global-pool SCA (TLC local pooling keeps the module path) and the
    default expansions.  Auto (None): $TDR_FUSED_NAFBLOCK.  Parameter
    names/shapes are identical in both paths, so checkpoints are
    interchangeable."""

    dim: int
    dw_expand: int = 2
    ffn_expand: int = 2
    tlc_kernel: tuple[int, int] | None = None
    dtype: jnp.dtype = jnp.float32
    fused: bool | None = None

    @nn.compact
    def __call__(self, inp):
        c = self.dim
        dw = c * self.dw_expand
        fused = (self.fused if self.fused is not None
                 else _FUSED_NAFBLOCK_DEFAULT)
        if (fused and self.tlc_kernel is None and self.dw_expand == 2
                and self.ffn_expand == 2):
            from textualdegremoval_tpu.ops.pallas.nafblock import (
                nafblock_fused, nafblock_ref)

            n1w, n1b = _LN2dParams(c, name="norm1")()
            w1, b1 = _ConvKB((1, 1, c, dw), name="conv1")()
            dwk, dwb = _ConvKB((3, 3, 1, dw), name="conv2")()
            sca_w, sca_b = _SCAParams(c, name="sca")()
            w3, b3 = _ConvKB((1, 1, c, c), name="conv3")()
            beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
            n2w, n2b = _LN2dParams(c, name="norm2")()
            w4, b4 = _ConvKB((1, 1, c, dw), name="conv4")()
            w5, b5 = _ConvKB((1, 1, c, c), name="conv5")()
            gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
            p = dict(norm1_w=n1w, norm1_b=n1b, w1=w1, b1=b1, dw=dwk,
                     dwb=dwb, sca_w=sca_w, sca_b=sca_b, w3=w3, b3=b3,
                     beta=beta, norm2_w=n2w, norm2_b=n2b, w4=w4, b4=b4,
                     w5=w5, b5=b5, gamma=gamma)
            xd = inp.astype(self.dtype)
            if jax.default_backend() == "tpu":
                return nafblock_fused(xd, p)
            return nafblock_ref(xd, p)
        x = LayerNorm2d(c, name="norm1")(inp)
        x = nn.Conv(dw, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = DWConv(dw, 3, use_bias=True, dtype=self.dtype, name="conv2")(x)
        x = simple_gate(x)
        x = SCA(dw // 2, self.tlc_kernel, self.dtype, name="sca")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv3")(x)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, c))
        y = inp + x * beta.astype(x.dtype)

        x = LayerNorm2d(c, name="norm2")(y)
        x = nn.Conv(self.ffn_expand * c, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv4")(x)
        x = simple_gate(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv5")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, c))
        return y + x * gamma.astype(x.dtype)
