"""Probe: the fused block's linear+depthwise stage — three formulations.

The round-3/4 roofline (BENCH_NOTES) says the fused TransformerBlock is
compute-bound on VPU stencils and MXU-underfilled matmuls (K=C<128 at the
c=48/96 levels).  VERDICT r4 item 4 maps a 2x2 space-to-depth K=192
formulation; this probe measures that idea and its stronger sibling before
any kernel rewrite:

  A. current: lin = x @ W (K=C), then 9-FMA depthwise stencil on the VPU
     (exactly the kernel's lin_dw stage, ops/pallas/tblock.py).
  B. composed: dw3x3(x @ W) == X9 @ W9 with X9 the 9-shifted channel
     concat (K=9C, pure data movement) and W9[(tap,ci),co] =
     W[ci,co]*dwtap[tap,co] — the ENTIRE stage becomes one dense-K MXU
     matmul (K=432 at c=48); the VPU stencil disappears.
  C. space-to-depth blockdiag (the literal VERDICT item): the per-pixel
     1x1 conv in (H/2,W/2,4C) space is X' @ kron(I4, W) — K=4C but 3/4 of
     the FLOPs are structural zeros.  Arithmetic says it loses (4x FLOPs
     at <=75% MXU util vs 1x at 37.5%); measured here for the record as a
     plain XLA matmul pair.

A/B run as real Pallas kernels over row tiles (same BlockSpec pattern as
tblock.py) at the flagship's c=48/c=96 512 px shapes; parity is checked
against an f32 oracle.

Usage: python tools/bench_qkv_form.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from textualdegremoval_tpu.ops.pallas.tblock import _dw3x3_rows

ITERS = 20
REPEATS = 3
_CP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _kernel_current(t, w, c, co):
    def kernel(xp_ref, xc_ref, xn_ref, w_ref, dw_ref, o_ref):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
        y2d = xh.reshape((t + 2) * w, c)
        lin = jax.lax.dot_general(
            y2d, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xh.dtype).reshape(t + 2, w, co)
        zrow = jnp.zeros((1, w, co), lin.dtype)
        top = jnp.where(i == 0, zrow, lin[0:1])
        bot = jnp.where(i == n - 1, zrow, lin[t + 1:t + 2])
        lin = jnp.concatenate([top, lin[1:t + 1], bot], axis=0)
        out = _dw3x3_rows(lin, dw_ref, 0, t, w, co, slice(0, co))
        o_ref[0] = out.astype(o_ref.dtype)
    return kernel


def _kernel_composed(t, w, c, co):
    def kernel(xp_ref, xc_ref, xn_ref, w9_ref, o_ref):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        xh = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
        # zero out-of-image halo rows of x (linear stage => same as the
        # current form's zeroing of lin's halo rows)
        zrow = jnp.zeros((1, w, c), xh.dtype)
        top = jnp.where(i == 0, zrow, xh[0:1])
        bot = jnp.where(i == n - 1, zrow, xh[t + 1:t + 2])
        xh = jnp.concatenate([top, xh[1:t + 1], bot], axis=0)
        zc = jnp.zeros((t, 1, c), xh.dtype)
        views = []
        for dy in range(3):
            rows = xh[dy:dy + t]
            views.append(jnp.concatenate([zc, rows[:, : w - 1]], axis=1))
            views.append(rows)
            views.append(jnp.concatenate([rows[:, 1:], zc], axis=1))
        x9 = jnp.concatenate(views, axis=-1).reshape(t * w, 9 * c)
        out = jax.lax.dot_general(
            x9, w9_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = out.reshape(t, w, co).astype(o_ref.dtype)
    return kernel


def _run_pallas(kernel, x, weights, t, co):
    b, hgt, wdt, c = x.shape
    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)

    def row(off):
        def imap(bi, i):
            r = i * t + off
            r = jnp.maximum(r, 0) if off < 0 else jnp.minimum(r, hgt - 1)
            return (bi, r, 0, 0)
        return pl.BlockSpec((1, 1, wdt, c), imap, memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, hgt // t),
        in_specs=[row(-1), body, row(t)] + [wspec] * len(weights),
        out_specs=pl.BlockSpec((1, t, wdt, co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hgt, wdt, co), x.dtype),
        compiler_params=_CP,
    )(x, x, x, *weights)


def _timed(fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def _chain(step):
    def run(x, *w):
        def body(_, carry):
            acc, xx = carry
            y = step(xx, *w)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return (acc + s, xx + s.astype(xx.dtype))
        return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))[0]
    return run


def oracle(x, w, dw):
    lin = jax.lax.dot_general(
        x.astype(jnp.float32).reshape(-1, x.shape[-1]), w.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
    ).reshape(x.shape[:3] + (w.shape[1],))
    k = dw.reshape(3, 3, 1, w.shape[1]).astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        lin, k, (1, 1), ((1, 1), (1, 1)),
        feature_group_count=w.shape[1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    key = jax.random.PRNGKey(0)
    # (H=W, C, C_out, tile) — qkv stage writes 3C but the kernel computes
    # q/k/v separately (C each); GDFN-in writes 2*hidden.  Probe both the
    # C->C (q slice) and C->2.66C-ish (GDFN) shapes at the two shallow
    # levels where K=C underfills the MXU.
    cases = [
        (512, 48, 48, 8),
        (512, 48, 128, 8),
        (512, 96, 96, 8),
        (512, 96, 256, 8),
    ]
    for hgt, c, co, t in cases:
        x = jax.random.normal(key, (1, hgt, hgt, c), jnp.float32)
        x = x.astype(jnp.bfloat16)
        w = jax.random.normal(key, (c, co), jnp.float32) / (c ** 0.5)
        dw = jax.random.normal(key, (9, co), jnp.float32) / 3.0
        w9 = (jnp.repeat(dw, c, axis=0).reshape(9 * c, co)
              * jnp.tile(w, (9, 1)))

        wa = [w.astype(jnp.bfloat16), dw]
        wb = [w9.astype(jnp.bfloat16)]
        ka = _kernel_current(t, hgt, c, co)
        kb = _kernel_composed(t, hgt, c, co)

        ya = _run_pallas(ka, x, wa, t, co)
        yb = _run_pallas(kb, x, wb, t, co)
        yo = oracle(x, w, dw)
        scale = float(jnp.max(jnp.abs(yo))) + 1e-9
        ea = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yo))) / scale
        eb = float(jnp.max(jnp.abs(yb.astype(jnp.float32) - yo))) / scale

        t_a = _timed(_chain(lambda xx, *wws: _run_pallas(ka, xx, list(wws),
                                                         t, co)), x, *wa)
        t_b = _timed(_chain(lambda xx, *wws: _run_pallas(kb, xx, list(wws),
                                                         t, co)), x, *wb)
        print(json.dumps({
            "case": f"{hgt}px {c}->{co} t{t}",
            "current_ms": round(t_a * 1e3, 3),
            "composed_ms": round(t_b * 1e3, 3),
            "speedup": round(t_a / t_b, 2),
            "rel_err_current": f"{ea:.1e}",
            "rel_err_composed": f"{eb:.1e}",
        }), flush=True)

    # C. literal space-to-depth blockdiag (XLA matmuls, no stencil): the
    # per-pixel linear stage only.  M=HW K=C N=3C vs M=HW/4 K=4C N=12C.
    for hgt, c in [(512, 48), (512, 96)]:
        x = jax.random.normal(key, (hgt * hgt, c), jnp.bfloat16)
        w = jax.random.normal(key, (c, 3 * c), jnp.bfloat16)
        x4 = jax.random.normal(key, (hgt * hgt // 4, 4 * c), jnp.bfloat16)
        wbd = jax.scipy.linalg.block_diag(*([w.astype(jnp.float32)] * 4))
        wbd = wbd.astype(jnp.bfloat16)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(a.dtype)

        t_plain = _timed(_chain(lambda xx, ww: mm(xx, ww)), x, w)
        t_bd = _timed(_chain(lambda xx, ww: mm(xx, ww)), x4, wbd)
        print(json.dumps({
            "case": f"s2d-blockdiag linear {hgt}px c{c}",
            "plain_K{}_ms".format(c): round(t_plain * 1e3, 3),
            "blockdiag_K{}_ms".format(4 * c): round(t_bd * 1e3, 3),
            "speedup": round(t_plain / t_bd, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
