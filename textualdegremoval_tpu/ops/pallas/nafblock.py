"""Fused whole-NAFBlock Pallas kernel.

One NAFBlock (reference models/archs/network_nafnet_guided_arch.py:178-238)
is LN1 -> 1x1 conv (C->2C) -> 3x3 dwconv -> SimpleGate -> SCA (global pool
+ 1x1 scale) -> 1x1 conv -> beta residual -> LN2 -> 1x1 (C->2C) ->
SimpleGate -> 1x1 -> gamma residual.  As XLA ops the 2C-wide hidden
tensors cross HBM ~10 times per block; the dominant NAFNet configs run 28
such blocks at the deepest encoder level.

Same architecture as the winning whole-TransformerBlock kernel
(ops/pallas/tblock.py, BENCH_NOTES.md round 3): the SCA global average is
the only cross-pixel dependency, so the block streams in two row-tile
passes:

* pass A reads x row tiles (1-row halo), computes LN1 + the two C-wide
  halves of conv1 (splitting the 2C weight columns keeps every in-kernel
  tensor C-wide and 128-lane aligned — no mid-lane SimpleGate slicing),
  the 9-shift depthwise conv + gate, and accumulates the per-channel pixel
  sum of the gated tensor (f32).
* tiny XLA glue computes the SCA scale s = mean @ W_sca + b (O(C^2)).
* pass B recomputes the gated tensor (recompute is cheaper than an HBM
  round-trip of the C-wide gate), applies s, conv3 + beta residual, then
  LN2 + the pointwise gated FFN (no spatial conv -> no extra halo) and the
  gamma residual, writing only the final C-wide output.

HBM traffic per block: ~2 x (1 + 2/t) reads + 1 write of the C-wide tensor
vs ~10 crossings (several 2C-wide) for the op chain.  Zero-padding
semantics of the dwconv follow the reference: conv2 zero-pads its *input*
(the conv1 output incl. bias), so out-of-image halo rows of the post-conv1
tensor are zeroed in-kernel.

TLC (local-pool SCA) variants keep the module path — the pool is a box
filter there, not a global mean.

Gradients: custom_vjp recomputing through `nafblock_ref` (plain jnp,
identical math) — exact grads, zero saved intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textualdegremoval_tpu.ops.norm import layer_norm_2d
from textualdegremoval_tpu.ops.pallas.tblock import _dw3x3_rows

_EPS = 1e-6  # LayerNorm2d eps (nafnet_arch_utils.py:264-300)


# ---------------------------------------------------------------------------
# Plain-jnp oracle (identical math to the Flax module path)
# ---------------------------------------------------------------------------


def _lin(v, w, b, cin, cout):
    y = jnp.einsum("bhwc,cd->bhwd", v, w.reshape(cin, cout).astype(v.dtype))
    return y + b.astype(v.dtype)


def _nafblock_conv_part(x, p):
    c = x.shape[-1]
    dt = x.dtype
    from textualdegremoval_tpu.ops.dwconv import dwconv_grad_shift

    y = layer_norm_2d(x, p["norm1_w"], p["norm1_b"])
    h = _lin(y, p["w1"], p["b1"], c, 2 * c)
    h = dwconv_grad_shift(h, p["dw"])
    h = h + p["dwb"].astype(dt)
    g = h[..., :c] * h[..., c:]
    pooled = jnp.mean(g, axis=(1, 2), keepdims=True)
    s = _lin(pooled, p["sca_w"], p["sca_b"], c, c)
    g = g * s
    o = _lin(g, p["w3"], p["b3"], c, c)
    return x + o * p["beta"].reshape(1, 1, 1, c).astype(dt)


def _nafblock_ffn_part(y1, p):
    c = y1.shape[-1]
    dt = y1.dtype
    z = layer_norm_2d(y1, p["norm2_w"], p["norm2_b"])
    h2 = _lin(z, p["w4"], p["b4"], c, 2 * c)
    g2 = h2[..., :c] * h2[..., c:]
    o2 = _lin(g2, p["w5"], p["b5"], c, c)
    return y1 + o2 * p["gamma"].reshape(1, 1, 1, c).astype(dt)


def nafblock_ref(x, p):
    """Whole NAFBlock, plain jnp.  p keys (natural module shapes):
    norm1_w/b (C,), w1 (1,1,C,2C), b1 (2C,), dw (3,3,1,2C), dwb (2C,),
    sca_w (1,1,C,C), sca_b (C,), w3 (1,1,C,C), b3 (C,), beta (1,1,1,C),
    norm2_w/b, w4 (1,1,C,2C), b4 (2C,), w5 (1,1,C,C), b5 (C,),
    gamma (1,1,1,C)."""
    return _nafblock_ffn_part(_nafblock_conv_part(x, p), p)


def _nafblock_ref_remat(x, p):
    """nafblock_ref with each half under jax.checkpoint(nothing_saveable)
    for the custom_vjp backward — only one half's 2C-wide hidden tensors
    are live at a time (see tblock._tblock_ref_remat)."""
    nothing = jax.checkpoint_policies.nothing_saveable
    x = jax.checkpoint(_nafblock_conv_part, policy=nothing)(x, p)
    return jax.checkpoint(_nafblock_ffn_part, policy=nothing)(x, p)


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _ln_rows(xf, w, b):
    """LayerNorm2d over the channel axis of an f32 (rows, W, C) tile —
    formula identical to ops.norm (one-read moments, maximum clamp)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(sq - mu * mu, 0.0)
    return (xf - mu) / jnp.sqrt(var + _EPS) * w + b


def _gate_rows(xh, i, n, t, w, c, ln1w_ref, ln1b_ref, w1a_ref, w1b_ref,
               b1_ref, dwt_ref):
    """LN1 + split conv1 + zero-pad halo + dwconv + bias + SimpleGate over
    an (t+2, W, C) tile -> (t, W, C) gated tensor in x.dtype."""
    xf = xh[:].astype(jnp.float32)
    y = _ln_rows(xf, ln1w_ref[...], ln1b_ref[...])
    y2d = y.reshape((t + 2) * w, c).astype(xh.dtype)

    def half(wref, col0, tap0, bias_row):
        lin = jax.lax.dot_general(
            y2d, wref, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 2, w, c)
        lin = lin + b1_ref[bias_row:bias_row + 1, :]
        # out-of-image halo rows: the reference zero-pads the conv2 INPUT
        # (= conv1 output incl. bias), so they are exactly zero
        zrow = jnp.zeros((1, w, c), lin.dtype)
        top = jnp.where(i == 0, zrow, lin[0:1])
        bot = jnp.where(i == n - 1, zrow, lin[t + 1:t + 2])
        lin = jnp.concatenate([top, lin[1:t + 1], bot], axis=0)
        d = _dw3x3_rows(lin, dwt_ref, tap0, t, w, c, slice(0, c))
        return (d + b1_ref[bias_row + 2:bias_row + 3, :]).astype(xh.dtype)

    da = half(w1a_ref[...], 0, 0, 0)
    db = half(w1b_ref[...], c, 9, 1)
    return da * db


# ---------------------------------------------------------------------------
# Pass A: per-channel pixel sum of the gated tensor
# ---------------------------------------------------------------------------


def _make_sum_kernel(t, w, c):
    def kernel(xp_ref, xc_ref, xn_ref, ln1w_ref, ln1b_ref, w1a_ref, w1b_ref,
               b1_ref, dwt_ref, ssum_ref, xh):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
        g = _gate_rows(xh, i, n, t, w, c, ln1w_ref, ln1b_ref, w1a_ref,
                       w1b_ref, b1_ref, dwt_ref)

        @pl.when(i == 0)
        def _init():
            ssum_ref[...] = jnp.zeros_like(ssum_ref)

        ssum_ref[0] += jnp.sum(
            g.astype(jnp.float32).reshape(t * w, c), axis=0, keepdims=True)

    return kernel


# ---------------------------------------------------------------------------
# Pass B: apply SCA scale + conv3 + residual + pointwise FFN + residual
# ---------------------------------------------------------------------------


def _make_apply_kernel(t, w, c):
    def kernel(xp_ref, xc_ref, xn_ref, ln1w_ref, ln1b_ref, w1a_ref, w1b_ref,
               b1_ref, dwt_ref, s_ref, w3_ref, ln2w_ref, ln2b_ref, w4a_ref,
               w4b_ref, b4_ref, w5_ref, bg_ref, out_ref, xh):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
        g = _gate_rows(xh, i, n, t, w, c, ln1w_ref, ln1b_ref, w1a_ref,
                       w1b_ref, b1_ref, dwt_ref)
        g = g * s_ref[0].astype(g.dtype)

        o = jax.lax.dot_general(
            g.reshape(t * w, c), w3_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t, w, c)
        # bg rows: 0 = b3, 1 = beta, 2 = b5, 3 = gamma
        o = o + bg_ref[0:1, :]
        y1 = xh[1:t + 1] + o * bg_ref[1:2, :].astype(xh.dtype)

        zf = _ln_rows(y1.astype(jnp.float32), ln2w_ref[...], ln2b_ref[...])
        z2d = zf.reshape(t * w, c).astype(xh.dtype)

        def half4(wref, bias_row):
            lin = jax.lax.dot_general(
                z2d, wref, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xh.dtype).reshape(t, w, c)
            return lin + b4_ref[bias_row:bias_row + 1, :]

        g2 = half4(w4a_ref[...], 0) * half4(w4b_ref[...], 1)
        o2 = jax.lax.dot_general(
            g2.reshape(t * w, c), w5_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t, w, c)
        o2 = o2 + bg_ref[2:3, :]
        out_ref[0] = (y1 + o2 * bg_ref[3:4, :].astype(xh.dtype)).astype(
            out_ref.dtype)

    return kernel


# Debug/tool override, read ONCE at import (no trace-time env reads).
import os as _os
_TILE_OVERRIDE = int(_os.environ.get("TDR_NAFBLOCK_TILE") or 0)


def _pick_tile(wdt: int, c: int) -> int:
    if _TILE_OVERRIDE:
        return _TILE_OVERRIDE
    wc = wdt * max(c, 128)
    if wc <= 512 * 64:
        return 8
    if wc <= 512 * 256:
        return 4
    return 2


_INTERPRET = False

# Mosaic scoped-VMEM ceiling (round 4, same rationale as tblock.py: v5e
# has 128 MiB/core; the 16 MiB default was the tile-size constraint).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)


def _nafblock_impl(x, p, interpret=None):
    if interpret is None:
        interpret = _INTERPRET
    b, hgt, wdt, c = x.shape
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2
    # Measured win region on v5e (BENCH_NOTES.md round 3): the kernel beats
    # the XLA op chain only at MXU-friendly channel widths with modest
    # spatial extent — 1.15-1.21x at c=512 below 128x128 (the GoPro
    # flagship's 28-deep encoder level at both train-crop and eval sizes),
    # a wash at c=1024@32x32, and a loss at c<=256 (half-empty lanes) or
    # 128x128+ (XLA's op chain is bandwidth-optimal at pow-2 tiles there).
    if not interpret and (c < 512 or hgt * wdt >= 128 * 128):
        return nafblock_ref(x, p)
    if t < 2 or hgt % t or wdt > 2048:
        return nafblock_ref(x, p)
    n_tiles = hgt // t
    f32 = jnp.float32

    w1 = p["w1"].reshape(c, 2 * c).astype(f32)
    w1a, w1b = w1[:, :c].astype(x.dtype), w1[:, c:].astype(x.dtype)
    dwf = p["dw"].reshape(9, 2 * c).astype(f32)
    # (18, C): rows 0-8 = first-half taps, 9-17 = second-half taps
    dwt = jnp.concatenate([dwf[:, :c], dwf[:, c:]], axis=0)
    # (4, C): conv1 bias halves (rows 0/1) + dwconv bias halves (rows 2/3)
    b1 = jnp.stack([
        p["b1"][:c], p["b1"][c:], p["dwb"][:c], p["dwb"][c:],
    ]).astype(x.dtype)

    ln1w = p["norm1_w"].astype(f32).reshape(1, c)
    ln1b = p["norm1_b"].astype(f32).reshape(1, c)
    ln2w = p["norm2_w"].astype(f32).reshape(1, c)
    ln2b = p["norm2_b"].astype(f32).reshape(1, c)

    w3 = p["w3"].reshape(c, c).astype(x.dtype)
    w4 = p["w4"].reshape(c, 2 * c).astype(f32)
    w4a, w4b = w4[:, :c].astype(x.dtype), w4[:, c:].astype(x.dtype)
    b4 = jnp.stack([p["b4"][:c], p["b4"][c:]]).astype(x.dtype)
    w5 = p["w5"].reshape(c, c).astype(x.dtype)
    # (4, C): b3, beta, b5, gamma
    bg = jnp.stack([
        p["b3"], p["beta"].reshape(c), p["b5"], p["gamma"].reshape(c),
    ]).astype(x.dtype)

    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    ssum = pl.pallas_call(
        _make_sum_kernel(t, wdt, c),
        grid=(b, n_tiles),
        in_specs=[row(-1), body, row(t)] + [wspec] * 6,
        out_specs=pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, c), f32),
        scratch_shapes=[pltpu.VMEM((t + 2, wdt, c), x.dtype)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, ln1w, ln1b, w1a, w1b, b1, dwt)

    # SCA glue: global mean -> 1x1 conv (O(C^2), plain XLA)
    pooled = (ssum / (hgt * wdt)).astype(x.dtype)
    s = jnp.einsum("bxc,cd->bxd", pooled,
                   p["sca_w"].reshape(c, c).astype(x.dtype))
    s = s + p["sca_b"].astype(x.dtype)  # (B, 1, C)

    return pl.pallas_call(
        _make_apply_kernel(t, wdt, c),
        grid=(b, n_tiles),
        in_specs=[row(-1), body, row(t)] + [wspec] * 6 + [
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [wspec] * 8,
        out_specs=body,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t + 2, wdt, c), x.dtype)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, ln1w, ln1b, w1a, w1b, b1, dwt, s, w3, ln2w, ln2b, w4a, w4b,
      b4, w5, bg)


@jax.custom_vjp
def nafblock_fused(x, p):
    """Fused whole NAFBlock.  x: (B, H, W, C); p: natural-shape param dict
    (see nafblock_ref).  Returns (B, H, W, C) in x.dtype."""
    return _nafblock_impl(x, p)


def _fwd(x, p):
    return _nafblock_impl(x, p), (x, p)


def _bwd(res, g):
    x, p = res
    _, vjp = jax.vjp(_nafblock_ref_remat, x, p)
    return vjp(g)


nafblock_fused.defvjp(_fwd, _bwd)
