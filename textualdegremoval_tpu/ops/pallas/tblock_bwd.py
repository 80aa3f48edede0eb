"""Streaming Pallas BACKWARD kernel for the GDFN half of TransformerBlock.

The training-step decomposition (BENCH_NOTES.md round 3) shows the
backward at ~4.5x the fused forward; its GDFN-half vjp re-materializes the
5.32C-wide hidden tensors through HBM four times (recompute write+read,
grad write+read).  This kernel computes the ENTIRE gdfn-half backward —
dx1 plus all weight gradients — in one streaming row-tile pass: the hidden
tensors and their gradients live only in VMEM, x1/dout are read once
(plus 2/1-row halos) and dx1 written once.

Math (identical to jax.vjp of tblock._tblock_gdfn_part):

    zf   = LN2(x1)                 (f32, one-pass moments, clamped var)
    hid  = z @ W1   (2 halves)     (bf16 operands, f32 accum -> model dtype)
    d    = dw3x3(hid)              (zero-padded hidden, f32)
    gate = gelu(d1) * d2
    gout = gate @ W2 ; out = x1 + gout

    dgate = dout @ W2^T ;  dW2 += gate^T dout
    dd1 = dgate * d2 * gelu'(d1) ; dd2 = dgate * gelu(d1)
    dhid = dw3x3^T(dd)  (flipped taps) ; dtap[j] += sum_p shift_j(hid) * dd
    dz = dhid @ W1^T ;  dW1 += z^T dhid
    dlnw += sum dz * zhat ; dlnb += sum dz
    dx1 = dout + LN2-bwd(dz)

gelu'(x) = 0.5*(1+erf(x/sqrt2)) + x * exp(-x^2/2)/sqrt(2*pi).

Weight gradients are grid-lifetime VMEM accumulators (constant-index
outputs, initialized at the first grid step, summed over batch x tiles).
Gradient parity vs jax.vjp of the reference is asserted in
tests/test_pallas_tblock_bwd.py (f32 interpret: tight tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textualdegremoval_tpu.ops.pallas.gdfn import (
    _gelu_exact, _erf, _round_up,
)

_EPS = 1e-5
_INV_SQRT2 = 2.0 ** -0.5
_INV_SQRT2PI = 0.3989422804014327


def _gelu_grad(x):
    return 0.5 * (1.0 + _erf(x * _INV_SQRT2)) \
        + x * _INV_SQRT2PI * jnp.exp(-0.5 * x * x)


def _ln_fwd_rows(xf, w, b, ln_type):
    """Returns (z, zhat, inv_sig, mu_inv) for LN over the channel axis
    (f32).  Both variants use the one-pass var = E[x^2] - mu^2 (clamped);
    BiasFree normalizes the UNCENTERED x (zhat = x * inv) — matching
    ops.norm / tblock._ln_rows."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(sq - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    if ln_type == "BiasFree":
        zhat = xf * inv
        return zhat * w, zhat, inv, mu * inv
    zhat = (xf - mu) * inv
    return zhat * w + b, zhat, inv, mu * inv


def _ln_bwd_rows(dz, zhat, inv, mu_inv, w, ln_type):
    """dx from dz for the LN above (f32).

    BiasFree: y = x*inv*w with var still mean-centered, so
    dx = (dzh - m2*(zhat - mu*inv)) * inv with m2 = mean(dzh*zhat)."""
    dzh = dz * w
    m2 = jnp.mean(dzh * zhat, axis=-1, keepdims=True)
    if ln_type == "BiasFree":
        return (dzh - m2 * (zhat - mu_inv)) * inv
    m1 = jnp.mean(dzh, axis=-1, keepdims=True)
    return (dzh - m1 - zhat * m2) * inv


def _dw_rows(x, taps, row0, t, w, ch, csl, flip=False):
    """Depthwise 3x3 over (t+2, W, ch) -> (t, W, ch) in f32.
    taps rows row0+j, columns csl hold tap j of this hidden chunk; flip
    reverses the stencil (transpose)."""
    z = jnp.zeros((x.shape[0], 1, ch), x.dtype)
    hs = (jnp.concatenate([z, x[:, : w - 1]], axis=1),
          x,
          jnp.concatenate([x[:, 1:], z], axis=1))
    out = jnp.zeros((t, w, ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            j = (2 - dy) * 3 + (2 - dx) if flip else dy * 3 + dx
            tap = taps[row0 + j: row0 + j + 1, csl]
            out = out + hs[dx][dy:dy + t] * tap[None]
    return out


def _make_gdfn_bwd_kernel(t, w, c, hpad, ch, ln_type):
    nchunk = hpad // ch

    def kernel(x1p2_ref, x1p1_ref, x1c_ref, x1n1_ref, x1n2_ref,
               gp_ref, gc_ref, gn_ref,
               ln2w_ref, ln2b_ref, w1_ref, dwg_ref, w2_ref,
               dx1_ref, dw1_ref, dtap_ref, dw2_ref, dlnw_ref, dlnb_ref,
               x1h, gh, dzacc):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        # x1 rows i*t-2 .. i*t+t+1 (t+4); dout rows i*t-1 .. i*t+t (t+2)
        x1h[:] = jnp.concatenate(
            [x1p2_ref[0], x1p1_ref[0], x1c_ref[0], x1n1_ref[0],
             x1n2_ref[0]], axis=0)
        gh[:] = jnp.concatenate([gp_ref[0], gc_ref[0], gn_ref[0]], axis=0)

        xf = x1h[:].astype(jnp.float32)
        lnw = ln2w_ref[...]
        lnb = ln2b_ref[...]
        z, zhat, inv, mu_inv = _ln_fwd_rows(xf, lnw, lnb, ln_type)
        z2d = z.reshape((t + 4) * w, c).astype(x1h.dtype)

        # dout with out-of-image halo rows zeroed (they do not exist)
        zrow = jnp.zeros((1, w, c), gh.dtype)
        gtop = jnp.where(i == 0, zrow, gh[0:1])
        gbot = jnp.where(i == n - 1, zrow, gh[t + 1:t + 2])
        gha = jnp.concatenate([gtop, gh[1:t + 1], gbot], axis=0)
        g2d = gha.reshape((t + 2) * w, c)

        @pl.when((i == 0) & (pl.program_id(0) == 0))
        def _init():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            dtap_ref[...] = jnp.zeros_like(dtap_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            dlnw_ref[...] = jnp.zeros_like(dlnw_ref)
            dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

        dzacc[:] = jnp.zeros_like(dzacc)
        for ci in range(nchunk):
            csl1 = slice(ci * ch, (ci + 1) * ch)
            csl2 = slice(hpad + ci * ch, hpad + (ci + 1) * ch)

            def hid_of(csl):
                hid = jax.lax.dot_general(
                    z2d, w1_ref[:, csl].astype(z2d.dtype),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(z2d.dtype).reshape(t + 4, w, ch)
                # zero the out-of-image hidden rows (2 top / 2 bottom of
                # the t+4 span at the image edges — fwd zero-pads hidden)
                zr = jnp.zeros((1, w, ch), hid.dtype)
                r0 = jnp.where(i == 0, zr, hid[0:1])
                r1 = jnp.where(i == 0, zr, hid[1:2])
                b0 = jnp.where(i == n - 1, zr, hid[t + 2:t + 3])
                b1 = jnp.where(i == n - 1, zr, hid[t + 3:t + 4])
                return jnp.concatenate(
                    [r0, r1, hid[2:t + 2], b0, b1], axis=0)

            hid1 = hid_of(csl1)
            hid2 = hid_of(csl2)
            # d on rows i*t-1 .. i*t+t (t+2): centers of the t+4 hid span
            d1 = _dw_rows(hid1, dwg_ref, 0, t + 2, w, ch, csl1)
            d2 = _dw_rows(hid2, dwg_ref, 9, t + 2, w, ch, csl1)

            # dgate on the same t+2 rows (from dout incl. 1-row halo)
            dgate = jax.lax.dot_general(
                g2d.astype(x1h.dtype), w2_ref[csl1.start:csl1.stop, :].T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t + 2, w, ch)

            gact = _gelu_exact(d1)
            dd1 = dgate * d2 * _gelu_grad(d1)
            dd2 = dgate * gact

            # dW2 += gate^T dout over the BODY rows only
            gate_body = (gact * d2)[1:t + 1].reshape(t * w, ch)
            dw2_ref[csl1.start:csl1.stop, :] += jax.lax.dot_general(
                gate_body.astype(x1h.dtype),
                gh[1:t + 1].reshape(t * w, c),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # dhid (body rows) = flipped-tap stencil over dd (t+2 rows)
            ddm1 = dd1.astype(x1h.dtype)
            ddm2 = dd2.astype(x1h.dtype)
            dhid1 = _dw_rows(ddm1, dwg_ref, 0, t, w, ch, csl1,
                             flip=True)
            dhid2 = _dw_rows(ddm2, dwg_ref, 9, t, w, ch, csl1,
                             flip=True)

            # dtap[j] += sum_p shift_j(hid)[p] * dd[p] over body rows:
            # shift_j(hid) aligned to dd's body rows means hid rows
            # (1 + dy - 1 .. ) — reuse the forward stencil alignment:
            # d_body[r] = sum_j hid[r + dy - 1, w + dx - 1] tap_j, so
            # dtap_j = sum_body shift_j(hid) * dd_body.
            ddb1 = dd1[1:t + 1]
            ddb2 = dd2[1:t + 1]
            def tapgrad_vec(hid, ddb, row0):
                hs = (jnp.concatenate(
                          [jnp.zeros((t + 4, 1, ch), hid.dtype),
                           hid[:, : w - 1]], axis=1),
                      hid,
                      jnp.concatenate(
                          [hid[:, 1:],
                           jnp.zeros((t + 4, 1, ch), hid.dtype)], axis=1))
                for dy in range(3):
                    for dx in range(3):
                        sh = hs[dx][1 + dy:1 + dy + t].astype(jnp.float32)
                        v = jnp.sum(sh * ddb, axis=(0, 1))  # (ch,)
                        j = row0 + dy * 3 + dx
                        dtap_ref[j:j + 1, csl1] += v[None]

            tapgrad_vec(hid1, ddb1, 0)
            tapgrad_vec(hid2, ddb2, 9)

            # dz (body) += dhid @ W1^T ; dW1 += z^T dhid (body rows)
            dh1b = dhid1.reshape(t * w, ch).astype(x1h.dtype)
            dh2b = dhid2.reshape(t * w, ch).astype(x1h.dtype)
            zbody = z2d.reshape(t + 4, w, c)[2:t + 2].reshape(t * w, c)
            dzacc[:] += (jax.lax.dot_general(
                dh1b, w1_ref[:, csl1].astype(x1h.dtype).T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                dh2b, w1_ref[:, csl2].astype(x1h.dtype).T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )).reshape(t, w, c)
            dw1_ref[:, csl1] += jax.lax.dot_general(
                zbody, dh1b,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw1_ref[:, csl2] += jax.lax.dot_general(
                zbody, dh2b,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # LN backward on the body rows
        dz = dzacc[:]
        zhat_b = zhat.reshape(t + 4, w, c)[2:t + 2]
        inv_b = inv.reshape(t + 4, w, 1)[2:t + 2]
        mu_inv_b = mu_inv.reshape(t + 4, w, 1)[2:t + 2]
        dlnw_ref[0] += jnp.sum((dz * zhat_b).reshape(t * w, c), axis=0)
        dlnb_ref[0] += jnp.sum(dz.reshape(t * w, c), axis=0)
        dx_ln = _ln_bwd_rows(dz, zhat_b, inv_b, mu_inv_b, lnw, ln_type)
        dx1_ref[0] = (gh[1:t + 1].astype(jnp.float32) + dx_ln).astype(
            dx1_ref.dtype)

    return kernel


def gdfn_half_bwd(x1, dout, p, ln_type, t):
    """One-pass streaming backward of the gdfn half.

    x1, dout: (B, H, W, C); p: natural-shape param dict (tblock_ref keys).
    Returns (dx1, grads) with grads = dict(norm2_w, norm2_b?, gd_in, gd_dw,
    gd_out) in natural shapes.
    """
    b, hgt, wdt, c = x1.shape
    h2 = p["gd_in"].shape[-1]
    hidden = h2 // 2
    ch = 128
    hpad = _round_up(hidden, ch)
    f32 = jnp.float32
    n_tiles = hgt // t

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
    ln2w = p["norm2_w"].astype(f32).reshape(1, c)
    ln2b = (p["norm2_b"].astype(f32).reshape(1, c)
            if ln_type != "BiasFree" else jnp.zeros((1, c), f32))

    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        return pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    from textualdegremoval_tpu.ops.pallas.tblock import _INTERPRET

    dx1, dw1, dtap, dw2, dlnw, dlnb = pl.pallas_call(
        _make_gdfn_bwd_kernel(t, wdt, c, hpad, ch, ln_type),
        grid=(b, n_tiles),
        in_specs=[row(-2), row(-1), body, row(t), row(t + 1),
                  row(-1), body, row(t),
                  wspec, wspec, wspec, wspec, wspec],
        out_specs=[body, acc((c, 2 * hpad)), acc((18, hpad)),
                   acc((hpad, c)), acc((1, c)), acc((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct((b, hgt, wdt, c), x1.dtype),
            jax.ShapeDtypeStruct((c, 2 * hpad), f32),
            jax.ShapeDtypeStruct((18, hpad), f32),
            jax.ShapeDtypeStruct((hpad, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t + 4, wdt, c), x1.dtype),
            pltpu.VMEM((t + 2, wdt, c), dout.dtype),
            pltpu.VMEM((t, wdt, c), f32),
        ],
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x1, x1, x1, x1, x1, dout, dout, dout, ln2w, ln2b, w1s, dwgs, w2s)

    pdt = p["gd_in"].dtype
    grads = {
        "gd_in": jnp.concatenate(
            [dw1[:, :hidden], dw1[:, hpad:hpad + hidden]], axis=1
        ).reshape(p["gd_in"].shape).astype(pdt),
        "gd_out": dw2[:hidden].reshape(p["gd_out"].shape).astype(
            p["gd_out"].dtype),
        "norm2_w": dlnw[0].astype(p["norm2_w"].dtype),
    }
    # gd_dw natural shape (3, 3, 1, 2h): taps rows 0-8 = first half,
    # 9-17 = second half, interleaved back to (9, 2h)
    dw_full = jnp.concatenate([dtap[:9, :hidden], dtap[9:, :hidden]],
                              axis=1)
    grads["gd_dw"] = dw_full.reshape(p["gd_dw"].shape).astype(
        p["gd_dw"].dtype)
    if ln_type != "BiasFree":
        grads["norm2_b"] = dlnb[0].astype(p["norm2_b"].dtype)
    return dx1, grads
