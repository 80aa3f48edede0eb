"""Fused whole-TransformerBlock Pallas kernel (Restormer MDTA + GDFN).

One Restormer block (reference network_restormer_guided_arch.py:318-331)
is LN1 -> qkv 1x1 -> qkv dwconv -> channel attention -> project_out ->
residual -> LN2 -> GDFN -> residual.  As XLA ops every intermediate
(3C-wide qkv, 2*2.66C-wide GDFN hidden) crosses HBM, ~2.2 GB per block at
512 px / dim 96.  Per-op Pallas kernels measurably LOSE in-model (four
times now, BENCH_NOTES.md): pallas_call is a fusion barrier, and the XLA
ILP overlap around each small kernel is worth more than its traffic save.
This kernel therefore fuses the ENTIRE residual-to-residual chain, so
there is nothing left around it for XLA to overlap.

The channel attention is global over pixels (per-head C x C gram of
L2-normalized q, k), so the block streams in two row-tile passes:

* pass A reads x row tiles (1-row halo), computes LN1 + the q/k thirds of
  the qkv convs in VMEM, and accumulates the full C x C gram plus the
  per-channel q/k square-sums (f32).  Computing the FULL gram instead of
  per-head blocks wastes heads x FLOPs on a tiny matrix but keeps every
  in-kernel slice 128-lane aligned (per-head lane-offset slices are what
  broke the round-1 MDTA kernel on Mosaic).
* tiny host glue (plain XLA, O(C^2)) normalizes the per-head diagonal
  blocks, applies temperature + softmax, and assembles the block-diagonal
  attention matrix A.
* pass B reads x row tiles (2-row halo), recomputes LN1 + the v third
  (recomputing v is cheaper than an HBM round-trip of the 3C qkv tensor),
  applies o = v @ A^T, project_out, the first residual, then LN2 + the
  fused GDFN (hidden lives only in VMEM, in 128-lane chunks) and the
  second residual, writing only the final C-wide output.

HBM traffic per block: ~(1 + 2/t) + (1 + 4/t) reads + 1 write of the
C-wide tensor vs ~20 crossings for the op chain.  Zero-padding semantics
of both depthwise convs are reproduced by zeroing the *post-1x1* rows that
fall outside the image (the reference zero-pads qkv and the GDFN hidden,
not x).

Gradients: custom_vjp recomputing through `tblock_ref` (plain jnp,
identical math) — exact grads, zero saved intermediates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textualdegremoval_tpu.ops.norm import (
    bias_free_layer_norm, with_bias_layer_norm,
)
from textualdegremoval_tpu.ops.attention import mdta_attention_nhwc
from textualdegremoval_tpu.ops.pallas.gdfn import (
    gdfn_ref, _gelu_exact, _round_up,
)

_EPS = 1e-5


# ---------------------------------------------------------------------------
# Plain-jnp oracle (identical math to the Flax module path)
# ---------------------------------------------------------------------------


def _ln(x, w, b, ln_type):
    if ln_type == "BiasFree":
        return bias_free_layer_norm(x, w)
    return with_bias_layer_norm(x, w, b)


def _dw3x3_nhwc(x, k):
    """Depthwise 3x3, k: (3, 3, 1, C) HWIO.  conv-emitter forward,
    shift-form backward (4x-faster filter grad, ops/dwconv.py)."""
    from textualdegremoval_tpu.ops.dwconv import dwconv_grad_shift

    return dwconv_grad_shift(x, k)


def _tblock_attn_part(x, p, heads, ln_type):
    c = x.shape[-1]
    y = _ln(x, p["norm1_w"], p.get("norm1_b"), ln_type)
    qkv = jnp.einsum("bhwc,cd->bhwd", y,
                     p["qkv"].reshape(c, 3 * c).astype(y.dtype))
    qkv = _dw3x3_nhwc(qkv, p["qkv_dw"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = mdta_attention_nhwc(q, k, v, p["temperature"], heads)
    o = jnp.einsum("bhwc,cd->bhwd", o,
                   p["proj"].reshape(c, c).astype(o.dtype))
    return x + o


def _tblock_gdfn_part(x, p, ln_type):
    c = x.shape[-1]
    z = _ln(x, p["norm2_w"], p.get("norm2_b"), ln_type)
    h2 = p["gd_in"].shape[-1]
    g = gdfn_ref(z, p["gd_in"].reshape(c, h2),
                 p["gd_dw"].reshape(3, 3, h2),
                 p["gd_out"].reshape(h2 // 2, c))
    return x + g


def tblock_ref(x, p, heads: int, ln_type: str = "WithBias"):
    """Whole TransformerBlock, plain jnp.  p keys (natural module shapes):
    norm1_w (C,), norm1_b (C,), qkv (1,1,C,3C), qkv_dw (3,3,1,3C),
    temperature (heads,1,1), proj (1,1,C,C), norm2_w, norm2_b,
    gd_in (1,1,C,2h), gd_dw (3,3,1,2h), gd_out (1,1,h,C)."""
    x = _tblock_attn_part(x, p, heads, ln_type)
    return _tblock_gdfn_part(x, p, ln_type)


def _tblock_ref_remat(x, p, heads, ln_type):
    """tblock_ref with each half under jax.checkpoint(nothing_saveable):
    used by the fused kernels' custom_vjp backward, so that differentiating
    the recompute only ever materializes ONE half's wide intermediates (the
    3C qkv / 5.32C GDFN hidden tensors) at a time — these dominated the
    training-step memory at full resolution (the b2@384 OOM's largest
    buffers were exactly bf16[...510] and bf16[...288] recompute tensors)."""
    nothing = jax.checkpoint_policies.nothing_saveable
    x = jax.checkpoint(
        functools.partial(_tblock_attn_part, heads=heads, ln_type=ln_type),
        policy=nothing)(x, p)
    return jax.checkpoint(
        functools.partial(_tblock_gdfn_part, ln_type=ln_type),
        policy=nothing)(x, p)


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _ln_rows(xf, w, b, ln_type):
    """LN over the channel axis of an f32 (rows, W, C) tile — formula
    identical to ops.norm (one-read moments, maximum clamp)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(sq - mu * mu, 0.0)
    if ln_type == "BiasFree":
        return xf / jnp.sqrt(var + _EPS) * w
    return (xf - mu) / jnp.sqrt(var + _EPS) * w + b


def _dw3x3_rows(hid, wref, row0, t, w, ch, csl):
    """9-shift depthwise 3x3 over (t+2, W, ch) -> (t, W, ch), f32 accum.
    wref rows row0+j hold tap j of this channel slice.

    The two x-shifts are hoisted to the full input tile (2 shifted copies
    total) instead of shifting each of the 9 (dy, dx) row-slices (6
    copies) — row-slice-then-shift == shift-then-row-slice, and the adds
    run in the same (dy, dx) order, so outputs are bit-identical."""
    n_rows = hid.shape[0]
    z = jnp.zeros((n_rows, 1, ch), hid.dtype)
    hs = (jnp.concatenate([z, hid[:, : w - 1]], axis=1),
          hid,
          jnp.concatenate([hid[:, 1:], z], axis=1))
    out = jnp.zeros((t, w, ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wref[row0 + dy * 3 + dx: row0 + dy * 3 + dx + 1, csl]
            out = out + hs[dx][dy:dy + t] * tap[None]
    return out


# ---------------------------------------------------------------------------
# Pass A: gram + square-sum statistics
# ---------------------------------------------------------------------------


def _make_stats_kernel(t, w, c, ln_type):
    def kernel(xp_ref, xc_ref, xn_ref, ln1w_ref, ln1b_ref, wq_ref, wk_ref,
               dwqk_ref, gram_ref, qs_ref, ks_ref, xh):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)

        xf = xh[:].astype(jnp.float32)
        y = _ln_rows(xf, ln1w_ref[...], ln1b_ref[...], ln_type)
        y2d = y.reshape((t + 2) * w, c).astype(xh.dtype)

        def lin_dw(wlin, row0):
            lin = jax.lax.dot_general(
                y2d, wlin, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xh.dtype).reshape(t + 2, w, c)
            # out-of-image halo rows: the reference zero-pads the qkv
            # tensor, so the convolved-in rows above/below the image are 0
            zrow = jnp.zeros((1, w, c), lin.dtype)
            top = jnp.where(i == 0, zrow, lin[0:1])
            bot = jnp.where(i == n - 1, zrow, lin[t + 1:t + 2])
            lin = jnp.concatenate([top, lin[1:t + 1], bot], axis=0)
            return _dw3x3_rows(lin, dwqk_ref, row0, t, w, c,
                               slice(0, c)).astype(xh.dtype)

        q = lin_dw(wq_ref[...], 0).reshape(t * w, c)
        k = lin_dw(wk_ref[...], 9).reshape(t * w, c)

        @pl.when(i == 0)
        def _init():
            gram_ref[...] = jnp.zeros_like(gram_ref)
            qs_ref[...] = jnp.zeros_like(qs_ref)
            ks_ref[...] = jnp.zeros_like(ks_ref)

        gram_ref[0] += jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qs_ref[0] += jnp.sum(qf * qf, axis=0, keepdims=True)
        ks_ref[0] += jnp.sum(kf * kf, axis=0, keepdims=True)

    return kernel


# ---------------------------------------------------------------------------
# Pass B: apply attention + project + LN2 + GDFN + residuals
# ---------------------------------------------------------------------------


def _make_apply_kernel(t, w, c, hpad, ch, ln_type, want_x1=False):
    nchunk = hpad // ch

    def kernel(xp2_ref, xp1_ref, xc_ref, xn1_ref, xn2_ref, ln1w_ref,
               ln1b_ref, wv_ref, dwv_ref, at_ref, wproj_ref, ln2w_ref,
               ln2b_ref, w1_ref, dwg_ref, w2_ref, out_ref, *rest):
        if want_x1:
            x1_out, xh, x1, acc = rest
        else:
            xh, x1, acc = rest
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate(
            [xp2_ref[0], xp1_ref[0], xc_ref[0], xn1_ref[0], xn2_ref[0]],
            axis=0)

        xf = xh[:].astype(jnp.float32)
        y = _ln_rows(xf, ln1w_ref[...], ln1b_ref[...], ln_type)
        v_lin = jax.lax.dot_general(
            y.reshape((t + 4) * w, c).astype(xh.dtype), wv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 4, w, c)
        # rows outside the image contribute zero qkv (reference zero-pad);
        # rows 0/1 are out of image only at i==0, rows t+2/t+3 at i==n-1
        zrow = jnp.zeros((1, w, c), v_lin.dtype)
        r0 = jnp.where(i == 0, zrow, v_lin[0:1])
        r1 = jnp.where(i == 0, zrow, v_lin[1:2])
        r2 = jnp.where(i == n - 1, zrow, v_lin[t + 2:t + 3])
        r3 = jnp.where(i == n - 1, zrow, v_lin[t + 3:t + 4])
        v_lin = jnp.concatenate([r0, r1, v_lin[2:t + 2], r2, r3], axis=0)
        v = _dw3x3_rows(v_lin, dwv_ref, 0, t + 2, w, c,
                        slice(0, c)).astype(xh.dtype)

        # o = v @ A^T (block-diagonal A == per-head attention), project_out,
        # first residual — on t+2 rows (1-row halo for the GDFN dwconv)
        o = jax.lax.dot_general(
            v.reshape((t + 2) * w, c), at_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xh.dtype)
        proj = jax.lax.dot_general(
            o, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 2, w, c)
        x1[:] = xh[1:t + 3] + proj

        # LN2 + fused GDFN on the t+2 rows, output on the t central rows
        zf = _ln_rows(x1[:].astype(jnp.float32), ln2w_ref[...],
                      ln2b_ref[...], ln_type)
        z2d = zf.reshape((t + 2) * w, c).astype(xh.dtype)
        acc[:] = jnp.zeros_like(acc)
        for ci in range(nchunk):
            csl1 = slice(ci * ch, (ci + 1) * ch)
            csl2 = slice(hpad + ci * ch, hpad + (ci + 1) * ch)

            def hid_of(csl):
                hid = jax.lax.dot_general(
                    z2d, w1_ref[:, csl].astype(z2d.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(z2d.dtype).reshape(t + 2, w, ch)
                # zero the out-of-image hidden rows (reference zero-pads
                # the GDFN hidden tensor)
                zr = jnp.zeros((1, w, ch), hid.dtype)
                top = jnp.where(i == 0, zr, hid[0:1])
                bot = jnp.where(i == n - 1, zr, hid[t + 1:t + 2])
                return jnp.concatenate([top, hid[1:t + 1], bot], axis=0)

            d1 = _dw3x3_rows(hid_of(csl1), dwg_ref, 0, t, w, ch,
                             slice(csl1.start, csl1.stop))
            d2 = _dw3x3_rows(hid_of(csl2), dwg_ref, 9, t, w, ch,
                             slice(csl1.start, csl1.stop))
            gate = _gelu_exact(d1) * d2
            acc[:] += jax.lax.dot_general(
                gate.reshape(t * w, ch).astype(z2d.dtype),
                w2_ref[csl1.start:csl1.stop],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t, w, c)

        out_ref[0] = (x1[1:t + 1] + acc[:].astype(xh.dtype)).astype(
            out_ref.dtype)
        if want_x1:
            x1_out[0] = x1[1:t + 1].astype(x1_out.dtype)

    return kernel


# ---------------------------------------------------------------------------
# Chained pass: apply block i + stats of block i+1 in one kernel
# ---------------------------------------------------------------------------


def _make_apply_stats_kernel(t, w, c, hpad, ch, ln_type):
    """Pass B of block i extended one row down (out rows i*t..i*t+t) plus
    the pass-A statistics of block i+1 over the body rows, using a 1-row
    stash of the previous tile's last output row as the top halo.  Saves
    the next block's full input re-read: per block-pair the x tensor
    crosses HBM (1 + 4/t) reads + 1 write instead of (2 + 6/t) + 1."""
    nchunk = hpad // ch

    def kernel(xp2_ref, xp1_ref, xc_ref, xn1_ref, xn2_ref, xn3_ref,
               ln1w_ref, ln1b_ref, wv_ref, dwv_ref, at_ref, wproj_ref,
               ln2w_ref, ln2b_ref, w1_ref, dwg_ref, w2_ref,
               n1w_ref, n1b_ref, wq_ref, wk_ref, dwqk_ref,
               out_ref, gram_ref, qs_ref, ks_ref,
               xh, x1, acc, stash):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        # xh rows 0..t+4 = image rows i*t-2 .. i*t+t+2
        xh[:] = jnp.concatenate(
            [xp2_ref[0], xp1_ref[0], xc_ref[0], xn1_ref[0], xn2_ref[0],
             xn3_ref[0]], axis=0)

        xf = xh[:].astype(jnp.float32)
        y = _ln_rows(xf, ln1w_ref[...], ln1b_ref[...], ln_type)
        v_lin = jax.lax.dot_general(
            y.reshape((t + 5) * w, c).astype(xh.dtype), wv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 5, w, c)
        # zero the out-of-image qkv rows (reference zero-pads qkv):
        # top 2 rows at i==0 (image rows -2, -1), bottom 3 at i==n-1
        # (image rows H, H+1, H+2)
        zrow = jnp.zeros((1, w, c), v_lin.dtype)
        r0 = jnp.where(i == 0, zrow, v_lin[0:1])
        r1 = jnp.where(i == 0, zrow, v_lin[1:2])
        b0 = jnp.where(i == n - 1, zrow, v_lin[t + 2:t + 3])
        b1 = jnp.where(i == n - 1, zrow, v_lin[t + 3:t + 4])
        b2 = jnp.where(i == n - 1, zrow, v_lin[t + 4:t + 5])
        v_lin = jnp.concatenate([r0, r1, v_lin[2:t + 2], b0, b1, b2], axis=0)
        # v on rows i*t-1 .. i*t+t+1 (t+3 rows)
        v = _dw3x3_rows(v_lin, dwv_ref, 0, t + 3, w, c,
                        slice(0, c)).astype(xh.dtype)

        o = jax.lax.dot_general(
            v.reshape((t + 3) * w, c), at_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xh.dtype)
        proj = jax.lax.dot_general(
            o, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 3, w, c)
        # x1 rows = image rows i*t-1 .. i*t+t+1
        x1[:] = xh[1:t + 4] + proj

        zf = _ln_rows(x1[:].astype(jnp.float32), ln2w_ref[...],
                      ln2b_ref[...], ln_type)
        z2d = zf.reshape((t + 3) * w, c).astype(xh.dtype)
        acc[:] = jnp.zeros_like(acc)
        for ci in range(nchunk):
            csl1 = slice(ci * ch, (ci + 1) * ch)
            csl2 = slice(hpad + ci * ch, hpad + (ci + 1) * ch)

            def hid_of(csl):
                hid = jax.lax.dot_general(
                    z2d, w1_ref[:, csl].astype(z2d.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(z2d.dtype).reshape(t + 3, w, ch)
                # zero out-of-image hidden rows: 1 top at i==0 (image -1),
                # 2 bottom at i==n-1 (image H, H+1)
                zr = jnp.zeros((1, w, ch), hid.dtype)
                top = jnp.where(i == 0, zr, hid[0:1])
                bm0 = jnp.where(i == n - 1, zr, hid[t + 1:t + 2])
                bm1 = jnp.where(i == n - 1, zr, hid[t + 2:t + 3])
                return jnp.concatenate([top, hid[1:t + 1], bm0, bm1], axis=0)

            d1 = _dw3x3_rows(hid_of(csl1), dwg_ref, 0, t + 1, w, ch,
                             slice(csl1.start, csl1.stop))
            d2 = _dw3x3_rows(hid_of(csl2), dwg_ref, 9, t + 1, w, ch,
                             slice(csl1.start, csl1.stop))
            gate = _gelu_exact(d1) * d2
            acc[:] += jax.lax.dot_general(
                gate.reshape((t + 1) * w, ch).astype(z2d.dtype),
                w2_ref[csl1.start:csl1.stop],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t + 1, w, c)

        # out rows i*t .. i*t+t (body + 1 extra bottom row for the stats
        # halo; the extra row is out-of-image garbage only at i==n-1,
        # where the stats mask zeroes it)
        out_full = (x1[1:t + 2] + acc[:].astype(xh.dtype)).astype(xh.dtype)
        out_ref[0] = out_full[:t].astype(out_ref.dtype)

        # ---- pass-A statistics of block i+1 over the body rows ----
        # stats span: stash (image row i*t-1, written by the previous grid
        # step) + out_full (rows i*t .. i*t+t)
        top_row = stash[:]
        so = jnp.concatenate([top_row, out_full], axis=0)  # (t+2, W, C)
        sf = so.astype(jnp.float32)
        ys = _ln_rows(sf, n1w_ref[...], n1b_ref[...], ln_type)
        ys2d = ys.reshape((t + 2) * w, c).astype(xh.dtype)

        def lin_dw(wlin, row0):
            lin = jax.lax.dot_general(
                ys2d, wlin, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xh.dtype).reshape(t + 2, w, c)
            zr = jnp.zeros((1, w, c), lin.dtype)
            topm = jnp.where(i == 0, zr, lin[0:1])
            botm = jnp.where(i == n - 1, zr, lin[t + 1:t + 2])
            lin = jnp.concatenate([topm, lin[1:t + 1], botm], axis=0)
            return _dw3x3_rows(lin, dwqk_ref, row0, t, w, c,
                               slice(0, c)).astype(xh.dtype)

        q = lin_dw(wq_ref[...], 0).reshape(t * w, c)
        k = lin_dw(wk_ref[...], 9).reshape(t * w, c)

        @pl.when(i == 0)
        def _init():
            gram_ref[...] = jnp.zeros_like(gram_ref)
            qs_ref[...] = jnp.zeros_like(qs_ref)
            ks_ref[...] = jnp.zeros_like(ks_ref)

        gram_ref[0] += jax.lax.dot_general(
            q, k, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qs_ref[0] += jnp.sum(qf * qf, axis=0, keepdims=True)
        ks_ref[0] += jnp.sum(kf * kf, axis=0, keepdims=True)

        # stash this tile's last body output row (image row i*t+t-1) as the
        # next tile's top stats-halo
        stash[:] = out_full[t - 1:t]

    return kernel


# measured-optimal row tiles per (W, C) on v5e (tools/bench_tblock.py
# sweep, BENCH_NOTES.md rounds 3-4).  Round 4: raising the Mosaic
# scoped-VMEM ceiling (compiler_params below) unlocked larger tiles —
# t=8 at (512, 96) went from compile-OOM to the fastest (7.52 -> 6.09
# ms/block); t=2 is always slower.
_TILE_TABLE = {
    (512, 48): 8, (512, 96): 8, (256, 96): 8, (256, 192): 16,
    (128, 192): 4, (128, 384): 8, (64, 384): 8, (64, 768): 8,
}


# Debug/tool override, read ONCE at import (trace-time env reads would
# defeat jit cache keys — set it before importing, as the bench tools do).
import os as _os
_TILE_OVERRIDE = int(_os.environ.get("TDR_TBLOCK_TILE") or 0)
# Kill-switch for the streaming gdfn-half backward kernel (import-time).
_GDFN_BWD_ENABLED = _os.environ.get("TDR_GDFN_BWD", "1") in ("1", "true",
                                                             "on")
# Kill-switch for the streaming attn-half backward kernel (import-time).
_ATTN_BWD_ENABLED = _os.environ.get("TDR_ATTN_BWD", "1") in ("1", "true",
                                                             "on")


def _pick_tile(wdt: int, c: int) -> int:
    if _TILE_OVERRIDE:
        return _TILE_OVERRIDE
    t = _TILE_TABLE.get((wdt, c))
    if t:
        return t
    wc = wdt * max(c, 128)
    if wc <= 512 * 48:
        return 8
    if wc <= 512 * 192:
        return 4
    return 2


_INTERPRET = False

# Mosaic scoped-VMEM ceiling for these kernels (v5e: 128 MiB/core; the
# compiler's 16 MiB default rejects the t=8 row tile at (512, 96) whose
# stack is ~20 MiB).  Leaves >90 MiB for the pipelined input windows.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024)


def _prep_block_weights(p, c, x_dtype, ln_type):
    """Kernel-layout weights for one block (shared by the single-block and
    chained paths)."""
    f32 = jnp.float32
    qkv = p["qkv"].reshape(c, 3 * c).astype(f32)
    wq, wk, wv = qkv[:, :c], qkv[:, c:2 * c], qkv[:, 2 * c:]
    dwqkv = p["qkv_dw"].reshape(9, 3 * c).astype(f32)
    dwqk = jnp.concatenate([dwqkv[:, :c], dwqkv[:, c:2 * c]], axis=0)
    dwv = dwqkv[:, 2 * c:]

    h2 = p["gd_in"].shape[-1]
    hidden = h2 // 2
    ch = 128
    hpad = _round_up(hidden, ch)
    w1 = p["gd_in"].reshape(c, h2).astype(f32)
    w1s = jnp.zeros((c, 2 * hpad), f32)
    w1s = w1s.at[:, :hidden].set(w1[:, :hidden])
    w1s = w1s.at[:, hpad:hpad + hidden].set(w1[:, hidden:])
    dwgf = p["gd_dw"].reshape(9, h2).astype(f32)
    dwgs = jnp.zeros((18, hpad), f32)
    dwgs = dwgs.at[:9, :hidden].set(dwgf[:, :hidden])
    dwgs = dwgs.at[9:, :hidden].set(dwgf[:, hidden:])
    w2s = jnp.zeros((hpad, c), f32).at[:hidden].set(
        p["gd_out"].reshape(hidden, c).astype(f32))

    return dict(
        ln1w=p["norm1_w"].astype(f32).reshape(1, c),
        ln1b=(p["norm1_b"].astype(f32).reshape(1, c)
              if ln_type != "BiasFree" else jnp.zeros((1, c), f32)),
        ln2w=p["norm2_w"].astype(f32).reshape(1, c),
        ln2b=(p["norm2_b"].astype(f32).reshape(1, c)
              if ln_type != "BiasFree" else jnp.zeros((1, c), f32)),
        wq=wq.astype(x_dtype), wk=wk.astype(x_dtype), dwqk=dwqk,
        wv=wv.astype(x_dtype), dwv=dwv,
        wproj=p["proj"].reshape(c, c).astype(x_dtype),
        w1s=w1s.astype(x_dtype), dwgs=dwgs, w2s=w2s.astype(x_dtype),
        hpad=hpad, ch=ch, temperature=p["temperature"],
    )


def _attn_matrix(gram, qssq, kssq, temperature, heads, dtype):
    """Per-head normalized softmax from the full-gram statistics, assembled
    as a block-diagonal (B, C, C) matrix.  Matches mdta_attention_nhwc:
    rsqrt(max(ssq, 1e-24)) norms, f32 softmax, temperature per head."""
    b, c, _ = gram.shape
    cph = c // heads
    qn = jax.lax.rsqrt(jnp.maximum(qssq, 1e-24))  # (B, 1, C)
    kn = jax.lax.rsqrt(jnp.maximum(kssq, 1e-24))
    a = jnp.zeros((b, c, c), jnp.float32)
    for hd in range(heads):
        sl = slice(hd * cph, (hd + 1) * cph)
        g = gram[:, sl, sl]
        g = g * (qn[:, 0, sl, None] * kn[:, 0, None, sl])
        g = jax.nn.softmax(g * temperature[hd, 0, 0].astype(jnp.float32),
                           axis=-1)
        a = a.at[:, sl, sl].set(g)
    return a.astype(dtype)


def _tblock_impl(x, p, heads, ln_type, interpret=None, want_x1=False,
                 want_stats=False):
    if interpret is None:
        interpret = _INTERPRET
    b, hgt, wdt, c = x.shape
    h2 = p["gd_in"].shape[-1]
    hidden = h2 // 2
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2
    # t >= 2 keeps the out-of-image row masks exact (at t == 1 the 2-row
    # halo of pass B spans two tiles at the bottom edge)
    if t < 2 or hgt % t or wdt > 2048:
        if want_x1:
            x1 = _tblock_attn_part(x, p, heads, ln_type)
            out = _tblock_gdfn_part(x1, p, ln_type)
            return (out, x1, None) if want_stats else (out, x1)
        return tblock_ref(x, p, heads, ln_type)
    n_tiles = hgt // t
    f32 = jnp.float32

    qkv = p["qkv"].reshape(c, 3 * c).astype(f32)
    wq, wk, wv = qkv[:, :c], qkv[:, c:2 * c], qkv[:, 2 * c:]
    dwqkv = p["qkv_dw"].reshape(9, 3 * c).astype(f32)
    # (18, C): rows 0-8 = q taps, rows 9-17 = k taps (pass A layout)
    dwqk = jnp.concatenate([dwqkv[:, :c], dwqkv[:, c:2 * c]], axis=0)
    dwv = dwqkv[:, 2 * c:]
    wproj = p["proj"].reshape(c, c).astype(f32)

    ln1w = p["norm1_w"].astype(f32).reshape(1, c)
    ln1b = (p["norm1_b"].astype(f32).reshape(1, c)
            if ln_type != "BiasFree" else jnp.zeros((1, c), f32))
    ln2w = p["norm2_w"].astype(f32).reshape(1, c)
    ln2b = (p["norm2_b"].astype(f32).reshape(1, c)
            if ln_type != "BiasFree" else jnp.zeros((1, c), f32))

    ch = 128
    hpad = _round_up(hidden, ch)
    w1 = p["gd_in"].reshape(c, h2).astype(f32)
    w1s = jnp.zeros((c, 2 * hpad), f32)
    w1s = w1s.at[:, :hidden].set(w1[:, :hidden])
    w1s = w1s.at[:, hpad:hpad + hidden].set(w1[:, hidden:])
    dwgf = p["gd_dw"].reshape(9, h2).astype(f32)
    dwgs = jnp.zeros((18, hpad), f32)
    dwgs = dwgs.at[:9, :hidden].set(dwgf[:, :hidden])
    dwgs = dwgs.at[9:, :hidden].set(dwgf[:, hidden:])
    w2s = jnp.zeros((hpad, c), f32).at[:hidden].set(
        p["gd_out"].reshape(hidden, c).astype(f32))
    # pass B matmuls consume weights in x.dtype (module-path semantics).
    # w1s included: the kernel casts its slices to z2d.dtype before the
    # matmul anyway, so pre-casting is bit-identical and halves the
    # largest weight buffer in VMEM (c x 2*hpad).
    wv_d = wv.astype(x.dtype)
    wproj_d = wproj.astype(x.dtype)
    dwv_d = dwv  # taps multiply into f32 accumulators; keep f32
    w1s_d = w1s.astype(x.dtype)
    w2s_d = w2s.astype(x.dtype)

    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    gram, qssq, kssq = pl.pallas_call(
        _make_stats_kernel(t, wdt, c, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-1), body, row(t), wspec, wspec, wspec, wspec, wspec],
        out_specs=[
            pl.BlockSpec((1, c, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
            jax.ShapeDtypeStruct((b, 1, c), f32),
        ],
        scratch_shapes=[pltpu.VMEM((t + 2, wdt, c), x.dtype)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, ln1w, ln1b, wq.astype(x.dtype), wk.astype(x.dtype), dwqk)

    at = _attn_matrix(gram, qssq, kssq, p["temperature"], heads,
                      x.dtype).transpose(0, 2, 1)

    result = pl.pallas_call(
        _make_apply_kernel(t, wdt, c, hpad, ch, ln_type, want_x1),
        grid=(b, n_tiles),
        in_specs=[row(-2), row(-1), body, row(t), row(t + 1),
                  wspec, wspec, wspec, wspec,
                  pl.BlockSpec((1, c, c), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=[body, body] if want_x1 else body,
        out_shape=(
            [jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype)] * 2
            if want_x1 else jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype)),
        scratch_shapes=[
            pltpu.VMEM((t + 4, wdt, c), x.dtype),
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t, wdt, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, x, x, ln1w, ln1b, wv_d, dwv_d, at, wproj_d, ln2w, ln2b,
      w1s_d, dwgs, w2s_d)
    if want_x1 and want_stats:
        out, x1 = result
        return out, x1, (gram, qssq, kssq)
    return result


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tblock_fused(x, p, heads: int, ln_type: str = "WithBias",
                 bwd_mode: str = "save"):
    """Fused whole TransformerBlock.  x: (B, H, W, C); p: natural-shape
    param dict (see tblock_ref).  Returns (B, H, W, C) in x.dtype.

    bwd_mode: 'save' (default) saves the attn-residual boundary x1 in the
    forward so the backward differentiates the two halves independently —
    fastest (666.5 -> 519.8 ms/step at 384px b1).  'remat' saves only
    (x, p) and recomputes through the two-part checkpoint — memory-lean,
    enables larger per-chip batches.  Threaded from the module attribute
    (models/layers.py TransformerBlock.bwd_mode), not process state."""
    return _tblock_impl(x, p, heads, ln_type)


def _fwd(x, p, heads, ln_type, bwd_mode):
    if bwd_mode == "remat":
        return _tblock_impl(x, p, heads, ln_type), (x, p, None, None)
    # Also save the pass-A statistics (C-sized, ~free): the streaming
    # attn-half backward derives every global softmax/norm gradient term
    # from them without re-running pass A.
    out, x1, stats = _tblock_impl(x, p, heads, ln_type, want_x1=True,
                                  want_stats=True)
    return out, (x, p, x1, stats)


def _gdfn_bwd_kernel_applies(x, p):
    """Use the streaming gdfn-half backward kernel when it fits: the
    weight-grad accumulators (c x 2*hpad f32, twice) live in VMEM for the
    whole grid; the kernel's 64 MB Mosaic ceiling (round 4 — v5e has 128
    MiB/core) admits every level of the flagship."""
    if not _GDFN_BWD_ENABLED:
        return 0
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return 0
    b, hgt, wdt, c = x.shape
    hidden = p["gd_in"].shape[-1] // 2
    from textualdegremoval_tpu.ops.pallas.gdfn import _round_up
    hpad = _round_up(hidden, 128)
    if wdt > 2048:
        return 0
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2

    # stack estimate calibrated against the compiler's 16.56 MB at
    # (w=384, c=96->128 lanes, t=4): f32 LN/stencil temporaries dominate
    ce = -(-c // 128) * 128

    def _vmem(tt):
        stack = wdt * ce * ((tt + 4) * 8 + (tt + 2) * 20 + tt * 8)
        io = (2 * tt + 6) * wdt * ce * 2 * 2
        accs = 2 * (c * 2 * hpad * 4) + hpad * c * 4
        return 1.25 * (stack + io + accs)

    budget = 56 * 1024 * 1024  # headroom under the 64 MB kernel ceiling
    while t > 2 and (_vmem(t) > budget or hgt % t):
        t //= 2
    if _vmem(t) > budget:
        return 0
    return t if (t >= 2 and hgt % t == 0) else 0


def _attn_bwd_kernel_applies(x, p):
    """Use the streaming attn-half backward kernel when its pass-2 VMEM
    footprint fits: 3 (t+4)- and 3 (t+2)-row activation buffers plus f32
    stack temporaries, under the 64 MB kernel ceiling."""
    if not _ATTN_BWD_ENABLED:
        return 0
    if jax.default_backend() != "tpu" and not _INTERPRET:
        return 0
    b, hgt, wdt, c = x.shape
    if wdt > 2048:
        return 0
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2
    ce = -(-c // 128) * 128
    eb = jnp.dtype(x.dtype).itemsize

    def _vmem(tt):
        scratch = wdt * ce * (3 * (tt + 4) * eb + 3 * (tt + 2) * eb
                              + tt * 4)
        stack = wdt * ce * ((tt + 4) * 8 + (tt + 2) * 16)
        io = (2 * tt + 8) * wdt * ce * eb
        weights = (5 * c * c * eb + c * 3 * c * 4 + c * c * 4
                   + 27 * ce * 4)
        return 1.3 * (scratch + stack + io + weights)

    budget = 56 * 1024 * 1024
    while t > 2 and (_vmem(t) > budget or hgt % t):
        t //= 2
    if _vmem(t) > budget:
        return 0
    return t if (t >= 2 and hgt % t == 0) else 0


def _bwd(heads, ln_type, bwd_mode, res, g):
    x, p, x1, stats = res
    if x1 is None:
        # bwd_mode='remat': nothing but (x, p) was saved.  Where the
        # streaming backward kernels apply, recompute the attn-boundary x1
        # and the pass-A statistics HERE — transient in the backward, one
        # extra fused-forward per block — and take the same kernel path as
        # 'save' mode (round 5: the previous two-part checkpointed ref
        # backward made remat steps 3.1x slower than non-remat at b2
        # because it bypassed both kernels).  Memory profile is unchanged:
        # x1/stats never persist from forward to backward.
        if _attn_bwd_kernel_applies(x, p) or _gdfn_bwd_kernel_applies(x, p):
            _, x1, stats = _tblock_impl(x, p, heads, ln_type, want_x1=True,
                                        want_stats=True)
        else:
            _, vjp = jax.vjp(
                lambda xx, pp: _tblock_ref_remat(xx, pp, heads, ln_type),
                x, p)
            return vjp(g)
    t = _gdfn_bwd_kernel_applies(x, p)
    if t:
        from textualdegremoval_tpu.ops.pallas.tblock_bwd import (
            gdfn_half_bwd)

        dx1, gd = gdfn_half_bwd(x1, g, p, ln_type, t)
        dp_g = {k: gd.get(k, jnp.zeros_like(v)) for k, v in p.items()}
    else:
        _, vjp_g = jax.vjp(
            lambda xx, pp: _tblock_gdfn_part(xx, pp, ln_type), x1, p)
        dx1, dp_g = vjp_g(g)
    ta = _attn_bwd_kernel_applies(x, p) if stats is not None else 0
    if ta:
        from textualdegremoval_tpu.ops.pallas.tblock_attn_bwd import (
            attn_half_bwd)

        dx, ga = attn_half_bwd(x, dx1, p, heads, ln_type, stats, ta)
        dp_a = {k: ga.get(k, jnp.zeros_like(v)) for k, v in p.items()}
    else:
        _, vjp_a = jax.vjp(
            lambda xx, pp: _tblock_attn_part(xx, pp, heads, ln_type), x, p)
        dx, dp_a = vjp_a(dx1)
    dp = jax.tree_util.tree_map(jnp.add, dp_g, dp_a)
    return dx, dp


tblock_fused.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Chained stages: B_i fused with A_{i+1}
# ---------------------------------------------------------------------------


def _tblock_chain_impl(x, ps, heads, ln_type, interpret=None):
    if interpret is None:
        interpret = _INTERPRET
    n_blocks = len(ps)
    if n_blocks == 0:
        return x
    b, hgt, wdt, c = x.shape
    if n_blocks == 1:
        return _tblock_impl(x, ps[0], heads, ln_type, interpret)
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2
    if t < 2 or hgt % t or wdt > 2048:
        y = x
        for p in ps:
            y = tblock_ref(y, p, heads, ln_type)
        return y
    f32 = jnp.float32
    W = [_prep_block_weights(p, c, x.dtype, ln_type) for p in ps]
    hpad, ch = W[0]["hpad"], W[0]["ch"]
    assert all(w["hpad"] == hpad for w in W)

    # Scoped-VMEM budget for the combined kernel (40 MB Mosaic ceiling
    # via _COMPILER_PARAMS, round 4; lanes pad c to multiples of 128).
    # Estimate calibrated against the compiler's reported 17.29 MB at
    # (512, c48->128, t8); shrink the row tile until it fits, and fall
    # back to the per-block fused kernels when even t=2 does not.
    eb = jnp.dtype(x.dtype).itemsize
    ce = -(-c // 128) * 128

    def _vmem(tt):
        per_row = wdt * ce * (eb * 3 + 4 + eb * 4)
        fixed = (wdt * ce * (5 * eb + 3 * eb + 4 + 12 * eb)
                 + 7 * ce * ce * eb + ce * 2 * hpad * 4
                 + hpad * ce * eb + 2 * ce * ce * 4)
        return 1.35 * (per_row * tt + fixed)

    budget = 36 * 1024 * 1024
    while t > 2 and (_vmem(t) > budget or hgt % t):
        t //= 2
    if not interpret and _vmem(t) > budget:
        y = x
        for p in ps:
            y = _tblock_impl(y, p, heads, ln_type, interpret)
        return y
    n_tiles = hgt // t

    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat_specs = [
        pl.BlockSpec((1, c, c), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    stat_shapes = [
        jax.ShapeDtypeStruct((b, c, c), f32),
        jax.ShapeDtypeStruct((b, 1, c), f32),
        jax.ShapeDtypeStruct((b, 1, c), f32),
    ]
    at_spec = pl.BlockSpec((1, c, c), lambda bi, i: (bi, 0, 0),
                           memory_space=pltpu.VMEM)

    # pass A of block 0
    w0 = W[0]
    gram, qssq, kssq = pl.pallas_call(
        _make_stats_kernel(t, wdt, c, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-1), body, row(t)] + [wspec] * 5,
        out_specs=stat_specs,
        out_shape=stat_shapes,
        scratch_shapes=[pltpu.VMEM((t + 2, wdt, c), x.dtype)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, w0["ln1w"], w0["ln1b"], w0["wq"], w0["wk"], w0["dwqk"])

    # middle blocks: apply block i + stats of block i+1, one kernel each
    for i in range(n_blocks - 1):
        at = _attn_matrix(gram, qssq, kssq, W[i]["temperature"], heads,
                          x.dtype).transpose(0, 2, 1)
        wi, wn = W[i], W[i + 1]
        x, gram, qssq, kssq = pl.pallas_call(
            _make_apply_stats_kernel(t, wdt, c, hpad, ch, ln_type),
            grid=(b, n_tiles),
            in_specs=([row(-2), row(-1), body, row(t), row(t + 1),
                       row(t + 2)] + [wspec] * 4 + [at_spec] + [wspec] * 11),
            out_specs=[body] + stat_specs,
            out_shape=[jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype)]
            + stat_shapes,
            scratch_shapes=[
                pltpu.VMEM((t + 5, wdt, c), x.dtype),
                pltpu.VMEM((t + 3, wdt, c), x.dtype),
                pltpu.VMEM((t + 1, wdt, c), jnp.float32),
                pltpu.VMEM((1, wdt, c), x.dtype),
            ],
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(x, x, x, x, x, x,
          wi["ln1w"], wi["ln1b"], wi["wv"], wi["dwv"], at, wi["wproj"],
          wi["ln2w"], wi["ln2b"], wi["w1s"], wi["dwgs"], wi["w2s"],
          wn["ln1w"], wn["ln1b"], wn["wq"], wn["wk"], wn["dwqk"])

    # pass B of the last block
    wl = W[-1]
    at = _attn_matrix(gram, qssq, kssq, wl["temperature"], heads,
                      x.dtype).transpose(0, 2, 1)
    return pl.pallas_call(
        _make_apply_kernel(t, wdt, c, hpad, ch, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-2), row(-1), body, row(t), row(t + 1),
                  wspec, wspec, wspec, wspec, at_spec,
                  wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=body,
        out_shape=jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 4, wdt, c), x.dtype),
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t, wdt, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, x, x, x, wl["ln1w"], wl["ln1b"], wl["wv"], wl["dwv"], at,
      wl["wproj"], wl["ln2w"], wl["ln2b"], wl["w1s"], wl["dwgs"], wl["w2s"])


def _chain_ref(x, ps, heads, ln_type):
    for p in ps:
        x = tblock_ref(x, p, heads, ln_type)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tblock_chain_fused(x, ps, heads: int, ln_type: str = "WithBias"):
    """A sequence of fused TransformerBlocks with cross-block kernel
    fusion: the streaming apply pass of block i also accumulates the
    attention statistics of block i+1, so each intermediate activation
    crosses HBM (1 + 4/t) reads + 1 write instead of (2 + 6/t) + 1.
    x: (B, H, W, C); ps: tuple of per-block natural-shape param dicts."""
    return _tblock_chain_impl(x, tuple(ps), heads, ln_type)


def _chain_fwd(x, ps, heads, ln_type):
    return _tblock_chain_impl(x, tuple(ps), heads, ln_type), (x, tuple(ps))


def _chain_bwd(heads, ln_type, res, g):
    x, ps = res

    def chain_remat(xx, pp):
        for p in pp:
            xx = _tblock_ref_remat(xx, p, heads, ln_type)
        return xx

    _, vjp = jax.vjp(chain_remat, x, ps)
    return vjp(g)


tblock_chain_fused.defvjp(_chain_fwd, _chain_bwd)
