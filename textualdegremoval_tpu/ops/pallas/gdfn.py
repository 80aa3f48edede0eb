"""Fused GDFN (gated-dconv FFN) Pallas kernel.

The GDFN (reference network_restormer_guided_arch.py:223-241) expands C
channels to 2*hidden (= 2 * int(2.66 * C)), depthwise-convolves, gates
(gelu(x1) * x2), and projects back.  As separate XLA ops the hidden tensor
crosses HBM four times (project_in write, dwconv read+write, gate/project_out
read); at 512 px / dim 96 that is ~1.07 GB per block and the single largest
traffic term in the whole model after the MASA transfer fix (see
BENCH_NOTES.md round-2 roofline).

This kernel streams row tiles: x rows (with a 1-row halo for the 3x3
depthwise conv) are read ONCE, the hidden tensor lives only in VMEM —
processed in lane-aligned channel chunks so VMEM stays ~8 MB — and only the
C-channel output is written back.  Per-block HBM traffic drops from
~4 hidden-tensor crossings to ~3 reads + 1 write of the C-wide tensor (the
two halo views re-read their row tiles).

Matmuls (project_in / project_out) hit the MXU with f32 accumulation; the
depthwise 3x3 is 9 shifted VPU FMAs accumulated in f32.  GELU is exact
(erf), matching jax.nn.gelu(approximate=False).  Halo rows outside the
image are zeros (host pad), which reproduces the reference's zero-padding
of the *hidden* tensor exactly (0 @ w1 = 0).

Gradient support: `gdfn_fused` is a custom_vjp whose backward recomputes
through the plain-jnp reference implementation (`gdfn_ref`) — the same
function, so gradients are exact while the hidden tensor is never saved
(free rematerialization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def gdfn_ref(x, w1, dwk, w2):
    """Plain-jnp GDFN, identical math to the kernel (and to the XLA module
    path).  x: (B, H, W, C); w1: (C, 2h); dwk: (3, 3, 2h); w2: (h, C)."""
    h2 = w1.shape[1]
    hidden = h2 // 2
    from textualdegremoval_tpu.ops.dwconv import dwconv_grad_shift

    y = jnp.einsum("bhwc,cd->bhwd", x, w1.astype(x.dtype))
    y = dwconv_grad_shift(y, dwk[:, :, None, :])
    x1, x2 = y[..., :hidden], y[..., hidden:]
    g = jax.nn.gelu(x1, approximate=False) * x2
    return jnp.einsum("bhwg,gc->bhwc", g, w2.astype(x.dtype))


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic
    has no erf primitive."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _make_kernel(t: int, w: int, c: int, hpad: int, ch: int):
    nchunk = hpad // ch

    def kernel(xp_ref, xc_ref, xn_ref, w1_ref, dwk_ref, w2_ref, out_ref,
               xh, acc):
        i = pl.program_id(1)
        n = pl.num_programs(1)
        # haloed row tile (t+2, W, C): 1-row sliver blocks above/below the
        # body tile; rows outside the image are zeroed, which reproduces the
        # reference's zero-padding of the *hidden* tensor (0 @ w1 = 0)
        zrow = jnp.zeros((1, w, c), xc_ref.dtype)
        top = jnp.where(i == 0, zrow, xp_ref[0])
        bot = jnp.where(i == n - 1, zrow, xn_ref[0])
        xh[:] = jnp.concatenate([top, xc_ref[0], bot], axis=0)

        acc[:] = jnp.zeros_like(acc)
        x2d = xh[:].reshape((t + 2) * w, c)
        for ci in range(nchunk):
            csl1 = slice(ci * ch, (ci + 1) * ch)
            csl2 = slice(hpad + ci * ch, hpad + (ci + 1) * ch)
            # hidden kept in the input dtype (the XLA module path also
            # materializes the hidden tensor in model dtype)
            hid1 = jax.lax.dot_general(
                x2d, w1_ref[:, csl1].astype(x2d.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x2d.dtype).reshape(t + 2, w, ch)
            hid2 = jax.lax.dot_general(
                x2d, w1_ref[:, csl2].astype(x2d.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x2d.dtype).reshape(t + 2, w, ch)

            def dw3x3(hid, row0):
                out = jnp.zeros((t, w, ch), jnp.float32)
                for dy in range(3):
                    rows = hid[dy:dy + t]
                    for dx in range(3):
                        if dx == 0:
                            shifted = jnp.concatenate(
                                [jnp.zeros((t, 1, ch), rows.dtype),
                                 rows[:, : w - 1]], axis=1)
                        elif dx == 2:
                            shifted = jnp.concatenate(
                                [rows[:, 1:],
                                 jnp.zeros((t, 1, ch), rows.dtype)], axis=1)
                        else:
                            shifted = rows
                        wrow = dwk_ref[row0 + dy * 3 + dx:
                                       row0 + dy * 3 + dx + 1, csl1]
                        out = out + shifted * wrow[None]
                return out

            d1 = dw3x3(hid1, 0)
            d2 = dw3x3(hid2, 9)
            gate = _gelu_exact(d1) * d2
            acc[:] += jax.lax.dot_general(
                gate.reshape(t * w, ch).astype(x2d.dtype),
                w2_ref[csl1.start:csl1.stop].astype(x2d.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t, w, c)

        out_ref[0] = acc[:].astype(out_ref.dtype)

    return kernel


def _pick_tile(wdt: int, c: int) -> int:
    # sized to keep kernel VMEM (halo tile + per-chunk f32 temporaries +
    # double-buffered in/out blocks) under the 16 MB budget; the row cost
    # scales with W*C
    wc = wdt * max(c, 128)
    if wc <= 512 * 48:
        return 8
    if wc <= 512 * 192:
        return 4
    return 2


# interpret-mode default for pallas_call (tests flip this to run the kernel
# on CPU; the Mosaic path needs a TPU backend)
_INTERPRET = False


def _gdfn_fused_impl(x, w1, dwk, w2, interpret: bool | None = None):
    if interpret is None:
        interpret = _INTERPRET
    b, hgt, wdt, c = x.shape
    h2 = w1.shape[1]
    hidden = h2 // 2
    t = _pick_tile(wdt, c)
    while t > 1 and hgt % t:
        t //= 2
    if hgt % t or wdt > 2048:
        return gdfn_ref(x, w1, dwk, w2)
    n_tiles = hgt // t

    ch = 128
    hpad = _round_up(hidden, ch)
    # split w1/dwk/w2 into (x1 | x2) halves, zero-padding hidden to the
    # chunk size: padded hidden channels produce gelu(0)*0 = 0 and the w2
    # pad rows are zero, so they contribute nothing.
    f32 = jnp.float32
    w1s = jnp.zeros((c, 2 * hpad), f32)
    w1s = w1s.at[:, :hidden].set(w1[:, :hidden].astype(f32))
    w1s = w1s.at[:, hpad:hpad + hidden].set(w1[:, hidden:].astype(f32))
    dwkf = dwk.reshape(9, h2).astype(f32)
    dwks = jnp.zeros((18, hpad), f32)
    dwks = dwks.at[:9, :hidden].set(dwkf[:, :hidden])
    dwks = dwks.at[9:, :hidden].set(dwkf[:, hidden:])
    w2s = jnp.zeros((hpad, c), f32).at[:hidden].set(w2.astype(f32))

    # halo rows as 1-row sliver blocks of x itself (block shape (1,1,W,C) =>
    # the H block index is the element row); clamped at image edges, where
    # the kernel zeroes them.  No host-side pad copy, no over-read.
    body = pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)
    prow = pl.BlockSpec((1, 1, wdt, c),
                        lambda bi, i: (bi, jnp.maximum(i * t - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    nrow = pl.BlockSpec(
        (1, 1, wdt, c),
        lambda bi, i: (bi, jnp.minimum(i * t + t, hgt - 1), 0, 0),
        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(t, wdt, c, hpad, ch),
        grid=(b, n_tiles),
        in_specs=[prow, body, nrow, wspec, wspec, wspec],
        out_specs=pl.BlockSpec((1, t, wdt, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hgt, wdt, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2, wdt, c), x.dtype),
            pltpu.VMEM((t, wdt, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, w1s, dwks, w2s)


@jax.custom_vjp
def gdfn_fused(x, w1, dwk, w2):
    """Fused GDFN.  x: (B, H, W, C); w1: (C, 2h); dwk: (3, 3, 2h);
    w2: (h, C).  Returns (B, H, W, C) in x.dtype (no residual add)."""
    return _gdfn_fused_impl(x, w1, dwk, w2)


def _fwd(x, w1, dwk, w2):
    return _gdfn_fused_impl(x, w1, dwk, w2), (x, w1, dwk, w2)


def _bwd(res, g):
    x, w1, dwk, w2 = res
    _, vjp = jax.vjp(gdfn_ref, x, w1, dwk, w2)
    return vjp(g)


gdfn_fused.defvjp(_fwd, _bwd)
