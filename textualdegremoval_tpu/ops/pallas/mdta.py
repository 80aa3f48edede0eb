"""Pallas TPU kernel for the MDTA channel-attention core.

The MDTA gram stage streams the full-resolution (L, C) tensors (L up to
512^2) to produce tiny per-head C x C statistics: sum-of-squares norms for
q/k and the q^T k gram.  XLA computes these as three separate reductions
(three reads of q/k); this kernel fuses them into ONE streaming pass —
each q/k tile is read from HBM once and feeds both the MXU gram
accumulations (all heads, via static channel slices) and the VPU norm
accumulation; the normalized softmax is computed in VMEM on the final tile.
No head transpose of the big tensors is ever materialized.

The value product (attn @ v) stays in XLA — it is a single well-shaped
batched matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_stats_kernel(heads: int, cph: int):
    def kernel(temp_ref, q_ref, k_ref, attn_ref, gram, ssq, ssk):
        j = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            gram[:] = jnp.zeros_like(gram)
            ssq[:] = jnp.zeros_like(ssq)
            ssk[:] = jnp.zeros_like(ssk)

        qt = q_ref[0].astype(jnp.float32)  # (TL, C)
        kt = k_ref[0].astype(jnp.float32)
        ssq[:] += jnp.sum(qt * qt, axis=0, keepdims=True)
        ssk[:] += jnp.sum(kt * kt, axis=0, keepdims=True)
        for h in range(heads):
            sl = slice(h * cph, (h + 1) * cph)
            gram[h] += jax.lax.dot_general(
                qt[:, sl], kt[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(j == nt - 1)
        def _finish():
            rq = jax.lax.rsqrt(jnp.maximum(ssq[:], 1e-24))  # (1, C)
            rk = jax.lax.rsqrt(jnp.maximum(ssk[:], 1e-24))
            for h in range(heads):
                sl = slice(h * cph, (h + 1) * cph)
                a = gram[h] * (rq[0, sl].reshape(cph, 1) *
                               rk[0, sl].reshape(1, cph))
                a = a * temp_ref[h, 0]
                attn_ref[0, h] = jax.nn.softmax(a, axis=-1)

    return kernel


def mdta_stats_pallas(q, k, temperature, heads: int, tile_l: int = 512):
    """q, k: (B, L, C) with heads along C.  temperature: (heads,).
    Returns softmaxed attention (B, heads, cph, cph) in float32."""
    b, l, c = q.shape
    cph = c // heads
    # pad L so zero rows contribute nothing to gram or norms
    lp = -(-l // tile_l) * tile_l
    if lp != l:
        pad = ((0, 0), (0, lp - l), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
    nt = lp // tile_l
    temp = temperature.reshape(heads, 1).astype(jnp.float32)

    return pl.pallas_call(
        _make_stats_kernel(heads, cph),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((heads, 1), lambda bi, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_l, c), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((1, tile_l, c), lambda bi, j: (bi, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, heads, cph, cph),
                               lambda bi, j: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, heads, cph, cph), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((heads, cph, cph), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * lp * cph * c + 4 * b * lp * c,
            bytes_accessed=2 * q.size * q.dtype.itemsize
            + b * heads * cph * cph * 4,
            transcendentals=b * heads * cph * cph,
        ),
        interpret=jax.default_backend() == "cpu",
    )(temp, q, k)


def mdta_attention_pallas(q, k, v, temperature, heads: int,
                          tile_l: int = 512):
    """Drop-in MDTA on NHWC tensors using the fused stats kernel.

    q, k, v: (B, H, W, C); temperature (heads, 1, 1). Returns (B, H, W, C).
    """
    b, h, w, c = q.shape
    cph = c // heads
    l = h * w
    qf = q.reshape(b, l, c)
    kf = k.reshape(b, l, c)
    attn = mdta_stats_pallas(qf, kf, temperature.reshape(heads), heads,
                             tile_l)
    vh = v.reshape(b, l, heads, cph)
    out = jnp.einsum("bhcd,blhd->blhc", attn.astype(v.dtype), vh)
    return out.reshape(b, h, w, c)
