"""Streaming Pallas BACKWARD for the ATTENTION half of TransformerBlock.

Completes the streaming backward story: the GDFN half already streams
(tblock_bwd.py); the attention half's jax.vjp re-materializes the 3C-wide
qkv tensor (recompute write+read, grad write+read) — at 384 px b1 it is
the largest remaining slice of the train step.  This module computes the
ENTIRE attn-half backward — dx plus all weight gradients — with the qkv
tensors living only in VMEM.

The channel attention is global over pixels, so the backward, like the
forward, needs global reductions.  The key observation making it
streamable in TWO row-tile passes + O(C^2) glue: every global quantity the
gradient needs is a small per-head matrix —

  pass 1 accumulates  dA[c,d]    = sum_p do[p,c] v[p,d]     (C x C)
                      dWproj     = sum_p o[p]  (x) dx1[p]
  glue (plain XLA):   softmax/temperature/L2-norm backward collapses to
                      M[c,d] = qn_c * tau * dZ[c,d] * kn_d   with
                      dZ = A (.) (dA - rowsum(dA (.) A)), and the
                      norm-backward pixel sums  s_q = sum_p dqhat.q  fold
                      into diag(M G^T) / diag(M^T G) of the ALREADY
                      accumulated forward gram G[c,d] = sum_p q[p,c]k[p,d]
                      — so no extra pixel pass:
                        dq_rows = k_rows @ M^T + q_rows * Dq,
                        dk_rows = q_rows @ M   + k_rows * Dk,
                        dv_rows = do_rows @ A,
                        Dq_c = -qn_c^2 * (M G)_cc,  Dk_d = -kn_d^2 (M^T G)_dd
  pass 2 recomputes q/k/v rows from x (t+4 halo), applies the small
  matrices, and finishes the chain: flipped-tap dwconv backward, tap
  grads, 1x1 backward (dWqkv), LN1 backward -> dx.

Math target: jax.vjp of tblock._tblock_attn_part (which is parity-tested
against the reference MDTA, network_restormer_guided_arch.py:246-277).
The forward gram/square-sum statistics (gram, qssq, kssq) are saved by the
fused forward (they are C-sized, ~free) so neither pass re-runs pass A.
Gradient parity asserted in tests/test_pallas_tblock_attn_bwd.py
(f32 interpret mode, tight tolerance, both LN types, multi-head, edges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textualdegremoval_tpu.ops.pallas.tblock_bwd import (
    _ln_fwd_rows, _ln_bwd_rows, _dw_rows,
)


# ---------------------------------------------------------------------------
# Glue: dA -> per-head small matrices (plain XLA, O(C^2))
# ---------------------------------------------------------------------------


def _attn_bwd_glue(da, gram, qssq, kssq, temperature, heads):
    """Softmax + temperature + L2-norm backward on the C x C statistics.

    Args:
      da: (B, C, C) f32 — grad wrt the post-softmax attention A.
      gram, qssq, kssq: forward pass-A statistics (B, C, C) / (B, 1, C).
      temperature: (heads, 1, 1).
    Returns:
      m:  (B, C, C) f32 block-diagonal; dq = k @ m^T + q * dqd,
          dk = q @ m + k * dkd.
      dqd, dkd: (B, 1, C) f32 per-channel diagonal terms.
      dtemp: (heads, 1, 1) in temperature.dtype.
    """
    b, c, _ = gram.shape
    cph = c // heads
    f32 = jnp.float32
    qss = qssq[:, 0, :]  # (B, C)
    kss = kssq[:, 0, :]
    qn = jax.lax.rsqrt(jnp.maximum(qss, 1e-24))
    kn = jax.lax.rsqrt(jnp.maximum(kss, 1e-24))

    m = jnp.zeros((b, c, c), f32)
    dqd = jnp.zeros((b, c), f32)
    dkd = jnp.zeros((b, c), f32)
    dtemp = []
    for hd in range(heads):
        sl = slice(hd * cph, (hd + 1) * cph)
        gh = gram[:, sl, sl]
        ghat = gh * (qn[:, sl, None] * kn[:, None, sl])
        tau = temperature[hd, 0, 0].astype(f32)
        a = jax.nn.softmax(ghat * tau, axis=-1)
        dah = da[:, sl, sl]
        dz = a * (dah - jnp.sum(dah * a, axis=-1, keepdims=True))
        dtemp.append(jnp.sum(dz * ghat))
        mh = (qn[:, sl, None] * kn[:, None, sl]) * (tau * dz)
        # norm-backward diagonal sums against the forward gram
        sq = jnp.sum(mh * gh, axis=2)  # (B, cph): (M G)_cc
        sk = jnp.sum(mh * gh, axis=1)  # (M^T G)_dd
        # jnp.maximum clamp: the norm path only differentiates when the
        # square-sum is above the clamp floor
        dq_h = jnp.where(qss[:, sl] > 1e-24, -(qn[:, sl] ** 2) * sq, 0.0)
        dk_h = jnp.where(kss[:, sl] > 1e-24, -(kn[:, sl] ** 2) * sk, 0.0)
        m = m.at[:, sl, sl].set(mh)
        dqd = dqd.at[:, sl].set(dq_h)
        dkd = dkd.at[:, sl].set(dk_h)
    dtemp = jnp.stack(dtemp).reshape(temperature.shape).astype(
        temperature.dtype)
    return m, dqd[:, None, :], dkd[:, None, :], dtemp


# ---------------------------------------------------------------------------
# Pass 1: accumulate dA and dWproj (recomputes only the v third)
# ---------------------------------------------------------------------------


def _make_attn_bwd_stats_kernel(t, w, c, ln_type):
    def kernel(xp_ref, xc_ref, xn_ref, g_ref, ln1w_ref, ln1b_ref,
               wv_ref, dwall_ref, at_ref, wprojt_ref,
               da_ref, dwproj_ref, xh):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)

        xf = xh[:].astype(jnp.float32)
        z, _, _, _ = _ln_fwd_rows(xf, ln1w_ref[...], ln1b_ref[...], ln_type)
        y2d = z.reshape((t + 2) * w, c).astype(xh.dtype)

        lin = jax.lax.dot_general(
            y2d, wv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 2, w, c)
        zrow = jnp.zeros((1, w, c), lin.dtype)
        top = jnp.where(i == 0, zrow, lin[0:1])
        bot = jnp.where(i == n - 1, zrow, lin[t + 1:t + 2])
        lin = jnp.concatenate([top, lin[1:t + 1], bot], axis=0)
        v = _dw_rows(lin, dwall_ref, 18, t, w, c, slice(0, c)).astype(
            xh.dtype).reshape(t * w, c)

        o = jax.lax.dot_general(
            v, at_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xh.dtype)
        g2d = g_ref[0].reshape(t * w, c)
        do = jax.lax.dot_general(
            g2d, wprojt_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xh.dtype)

        @pl.when(i == 0)
        def _init_da():
            da_ref[...] = jnp.zeros_like(da_ref)

        @pl.when((i == 0) & (pl.program_id(0) == 0))
        def _init_wp():
            dwproj_ref[...] = jnp.zeros_like(dwproj_ref)

        da_ref[0] += jax.lax.dot_general(
            do, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwproj_ref[...] += jax.lax.dot_general(
            o, g2d, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


# ---------------------------------------------------------------------------
# Pass 2: dx + dWqkv + tap grads + dLN1
# ---------------------------------------------------------------------------


def _make_attn_bwd_apply_kernel(t, w, c, ln_type):
    def kernel(xp2_ref, xp1_ref, xc_ref, xn1_ref, xn2_ref,
               gp_ref, gc_ref, gn_ref,
               ln1w_ref, ln1b_ref, wq_ref, wk_ref, wv_ref, dwall_ref,
               a_ref, wprojt_ref, m_ref, dqd_ref, dkd_ref,
               dx_ref, dwqkv_ref, dtap_ref, dlnw_ref, dlnb_ref,
               xh, lin1, lin2, qb, kb, dob, dyacc):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh[:] = jnp.concatenate(
            [xp2_ref[0], xp1_ref[0], xc_ref[0], xn1_ref[0], xn2_ref[0]],
            axis=0)

        xf = xh[:].astype(jnp.float32)
        lnw = ln1w_ref[...]
        lnb = ln1b_ref[...]
        z, zhat, inv, mu_inv = _ln_fwd_rows(xf, lnw, lnb, ln_type)
        y2d = z.reshape((t + 4) * w, c).astype(xh.dtype)

        def lin_of(wref):
            lin = jax.lax.dot_general(
                y2d, wref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xh.dtype).reshape(t + 4, w, c)
            # out-of-image qkv rows are zero (reference zero-pads qkv)
            zr = jnp.zeros((1, w, c), lin.dtype)
            r0 = jnp.where(i == 0, zr, lin[0:1])
            r1 = jnp.where(i == 0, zr, lin[1:2])
            b0 = jnp.where(i == n - 1, zr, lin[t + 2:t + 3])
            b1 = jnp.where(i == n - 1, zr, lin[t + 3:t + 4])
            return jnp.concatenate([r0, r1, lin[2:t + 2], b0, b1], axis=0)

        lin1[:] = lin_of(wq_ref)
        lin2[:] = lin_of(wk_ref)
        qb[:] = _dw_rows(lin1[:], dwall_ref, 0, t + 2, w, c,
                         slice(0, c)).astype(xh.dtype)
        kb[:] = _dw_rows(lin2[:], dwall_ref, 9, t + 2, w, c,
                         slice(0, c)).astype(xh.dtype)

        # do on rows i*t-1 .. i*t+t from the dx1 halo (edge rows zeroed —
        # gradients at out-of-image pixels do not exist)
        zrow = jnp.zeros((1, w, c), gc_ref.dtype)
        gtop = jnp.where(i == 0, zrow, gp_ref[0])
        gbot = jnp.where(i == n - 1, zrow, gn_ref[0])
        gha = jnp.concatenate([gtop, gc_ref[0], gbot], axis=0)
        dob[:] = jax.lax.dot_general(
            gha.reshape((t + 2) * w, c), wprojt_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 2, w, c)

        @pl.when((i == 0) & (pl.program_id(0) == 0))
        def _init():
            dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
            dtap_ref[...] = jnp.zeros_like(dtap_ref)
            dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
            dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

        dyacc[:] = jnp.zeros_like(dyacc)
        ybody = y2d.reshape(t + 4, w, c)[2:t + 2].reshape(t * w, c)

        def edge_mask(arr):
            # zero the out-of-image rows of a (t+2, w, c) f32 grad tile
            zr = jnp.zeros((1, w, c), arr.dtype)
            top = jnp.where(i == 0, zr, arr[0:1])
            bot = jnp.where(i == n - 1, zr, arr[t + 1:t + 2])
            return jnp.concatenate([top, arr[1:t + 1], bot], axis=0)

        def third(dthird, lin_buf, row0, w3_ref, col0):
            """dthird: (t+2, w, c) f32, edge-masked grad of one qkv third
            (post-dwconv).  Chains: flipped-tap dwconv backward, tap
            grads against lin_buf, dyacc += dlin @ W^T, dWqkv slice."""
            dmt = dthird.astype(xh.dtype)
            dlin = _dw_rows(dmt, dwall_ref, row0, t, w, c, slice(0, c),
                            flip=True)
            # tap grads over the body rows: dtap_j = sum shift_j(lin).dd
            lin_full = lin_buf[:]
            zcol = jnp.zeros((t + 4, 1, c), lin_full.dtype)
            hs = (jnp.concatenate([zcol, lin_full[:, : w - 1]], axis=1),
                  lin_full,
                  jnp.concatenate([lin_full[:, 1:], zcol], axis=1))
            ddb = dthird[1:t + 1]
            for dy in range(3):
                for dx in range(3):
                    sh = hs[dx][1 + dy:1 + dy + t].astype(jnp.float32)
                    val = jnp.sum(sh * ddb, axis=(0, 1))  # (c,)
                    j = row0 + dy * 3 + dx
                    dtap_ref[j:j + 1, :] += val[None]
            dlin2d = dlin.reshape(t * w, c).astype(xh.dtype)
            dyacc[:] += jax.lax.dot_general(
                dlin2d, w3_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t, w, c)
            dwqkv_ref[:, col0:col0 + c] += jax.lax.dot_general(
                ybody, dlin2d, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        q2d = qb[:].reshape((t + 2) * w, c)
        k2d = kb[:].reshape((t + 2) * w, c)

        # q third: dq = k @ M^T + q * Dq
        dq = jax.lax.dot_general(
            k2d, m_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq = dq + q2d.astype(jnp.float32) * dqd_ref[0]
        third(edge_mask(dq.reshape(t + 2, w, c)), lin1, 0, wq_ref, 0)

        # k third: dk = q @ M + k * Dk
        dk = jax.lax.dot_general(
            q2d, m_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = dk + k2d.astype(jnp.float32) * dkd_ref[0]
        third(edge_mask(dk.reshape(t + 2, w, c)), lin2, 9, wk_ref, c)

        # v third (lin1 buffer reused): dv = do @ A
        lin1[:] = lin_of(wv_ref)
        dv = jax.lax.dot_general(
            dob[:].reshape((t + 2) * w, c), a_ref[0].astype(xh.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        third(edge_mask(dv.reshape(t + 2, w, c)), lin1, 18, wv_ref, 2 * c)

        # LN1 backward on the body rows
        dy = dyacc[:]
        zhat_b = zhat.reshape(t + 4, w, c)[2:t + 2]
        inv_b = inv.reshape(t + 4, w, 1)[2:t + 2]
        mu_inv_b = mu_inv.reshape(t + 4, w, 1)[2:t + 2]
        dlnw_ref[0] += jnp.sum((dy * zhat_b).reshape(t * w, c), axis=0)
        dlnb_ref[0] += jnp.sum(dy.reshape(t * w, c), axis=0)
        dx_ln = _ln_bwd_rows(dy, zhat_b, inv_b, mu_inv_b, lnw, ln_type)
        dx_ref[0] = (gc_ref[0].astype(jnp.float32) + dx_ln).astype(
            dx_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# Wrapper
# ---------------------------------------------------------------------------


def attn_half_bwd(x, dx1, p, heads, ln_type, stats, t):
    """Two-pass streaming backward of the attention half.

    x, dx1: (B, H, W, C) — block input and upstream grad at the
    attn-residual boundary x1; p: natural-shape param dict (tblock_ref
    keys); stats: (gram, qssq, kssq) saved by the fused forward's pass A.
    Returns (dx, grads) with grads = dict(norm1_w, norm1_b?, qkv, qkv_dw,
    temperature, proj) in natural shapes.
    """
    from textualdegremoval_tpu.ops.pallas.tblock import (
        _attn_matrix, _INTERPRET)

    b, hgt, wdt, c = x.shape
    f32 = jnp.float32
    gram, qssq, kssq = stats
    n_tiles = hgt // t

    qkv = p["qkv"].reshape(c, 3 * c).astype(f32)
    wq = qkv[:, :c].astype(x.dtype)
    wk = qkv[:, c:2 * c].astype(x.dtype)
    wv = qkv[:, 2 * c:].astype(x.dtype)
    dwqkv = p["qkv_dw"].reshape(9, 3 * c).astype(f32)
    # (27, C): rows 0-8 q taps, 9-17 k, 18-26 v
    dwall = jnp.concatenate(
        [dwqkv[:, :c], dwqkv[:, c:2 * c], dwqkv[:, 2 * c:]], axis=0)
    wprojt = p["proj"].reshape(c, c).astype(f32).T.astype(x.dtype)
    ln1w = p["norm1_w"].astype(f32).reshape(1, c)
    ln1b = (p["norm1_b"].astype(f32).reshape(1, c)
            if ln_type != "BiasFree" else jnp.zeros((1, c), f32))

    a = _attn_matrix(gram, qssq, kssq, p["temperature"], heads, x.dtype)
    at = a.transpose(0, 2, 1)

    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def perb(shape):
        return pl.BlockSpec(shape, lambda bi, i: (bi,) + (0,) * (
            len(shape) - 1), memory_space=pltpu.VMEM)

    def acc(shape):
        return pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    da, dwproj = pl.pallas_call(
        _make_attn_bwd_stats_kernel(t, wdt, c, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-1), body, row(t), body,
                  wspec, wspec, wspec, wspec, perb((1, c, c)), wspec],
        out_specs=[perb((1, c, c)), acc((c, c))],
        out_shape=[jax.ShapeDtypeStruct((b, c, c), f32),
                   jax.ShapeDtypeStruct((c, c), f32)],
        scratch_shapes=[pltpu.VMEM((t + 2, wdt, c), x.dtype)],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, x, x, dx1, ln1w, ln1b, wv, dwall, at, wprojt)

    m, dqd, dkd, dtemp = _attn_bwd_glue(
        da, gram, qssq, kssq, p["temperature"], heads)

    dx, dwqkv_g, dtap, dlnw, dlnb = pl.pallas_call(
        _make_attn_bwd_apply_kernel(t, wdt, c, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-2), row(-1), body, row(t), row(t + 1),
                  row(-1), body, row(t),
                  wspec, wspec, wspec, wspec, wspec, wspec,
                  perb((1, c, c)), wspec, perb((1, c, c)),
                  perb((1, 1, c)), perb((1, 1, c))],
        out_specs=[body, acc((c, 3 * c)), acc((27, c)),
                   acc((1, c)), acc((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((27, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t + 4, wdt, c), x.dtype),
            pltpu.VMEM((t + 4, wdt, c), x.dtype),
            pltpu.VMEM((t + 4, wdt, c), x.dtype),
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t, wdt, c), f32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, x, x, x, x, dx1, dx1, dx1, ln1w, ln1b, wq, wk, wv, dwall,
      a, wprojt, m, dqd, dkd)

    pdt = p["qkv"].dtype
    grads = {
        "qkv": dwqkv_g.reshape(p["qkv"].shape).astype(pdt),
        "qkv_dw": jnp.concatenate(
            [dtap[0:9], dtap[9:18], dtap[18:27]], axis=1
        ).reshape(p["qkv_dw"].shape).astype(p["qkv_dw"].dtype),
        "proj": dwproj.reshape(p["proj"].shape).astype(p["proj"].dtype),
        "temperature": dtemp,
        "norm1_w": dlnw[0].astype(p["norm1_w"].dtype),
    }
    if ln_type != "BiasFree":
        grads["norm1_b"] = dlnb[0].astype(p["norm1_b"].dtype)
    return dx, grads
