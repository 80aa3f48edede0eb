"""Dense KxK convolution with a shift-matmul FILTER gradient.

The MASA encoder (models/layers.py MASAEncoder — reference semantics
network_nafnet_guided_arch.py:110-143) is plain 3x3 convs in ReLU residual
blocks; its backward is the largest remaining mass of the 384 px guided
train step after the fused-block kernels (BENCH_NOTES round 3: the encoder
backward alone is ~53 ms of the 108 ms MASA fwd+bwd).

XLA-TPU lowers the dense filter gradient dW through the conv emitter with
the batch axis as the contraction; like the depthwise case
(ops/dwconv.dwconv_grad_shift) that lowering is measured well below the
explicit formulation

    dW[dy, dx] = shifted(x)[dy, dx]^T @ g        (K^2 MXU einsums)

whose contraction runs over N*OH*OW (huge K -> full MXU) with f32
accumulation (``preferred_element_type``), matching the emitter's f32
accumulator.  See tools/bench_conv_grad.py for the per-shape measurements.

The input gradient dx stays on XLA's standard transposed conv (its dgrad is
a dense conv — MXU-friendly); it is emitted via ``jax.linear_transpose`` so
stride/padding transposition is derived, not hand-coded.

Forward semantics: ``lax.conv_general_dilated`` NHWC/HWIO, stride s,
zero padding SAME for odd K (torch ``nn.Conv2d(padding=K//2)``, the form
every reference encoder conv uses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, kernel, stride):
    p = kernel.shape[0] // 2, kernel.shape[1] // 2
    return lax.conv_general_dilated(
        x, kernel, (stride, stride), ((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_grad_shift(x, kernel, stride: int = 1):
    """Dense KxK conv: conv-emitter forward, shift-matmul filter gradient.

    x: (N, H, W, Cin); kernel: (K, K, Cin, Cout) HWIO (flax nn.Conv
    layout, so checkpoints are interchangeable); odd K, zero padding K//2.
    Returns (N, OH, OW, Cout) in the promoted input dtype.
    """
    return _conv(x, kernel.astype(x.dtype), stride)


def _cgs_fwd(x, kernel, stride):
    return conv_grad_shift(x, kernel, stride), (x, kernel)


def _cgs_bwd(stride, res, g):
    x, kernel = res
    kd = kernel.astype(x.dtype)
    # dx: XLA's standard transposed conv (dense dgrad is MXU-friendly);
    # linear_transpose derives the stride/padding transposition.
    dx = jax.linear_transpose(lambda xx: _conv(xx, kd, stride), x)(g)[0]
    # dW: K^2 shifted strided slices of x, each one MXU einsum whose
    # contraction runs over all of N*OH*OW, f32 accumulation.
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = kh // 2, kw // 2
    oh, ow = g.shape[1], g.shape[2]
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    rows = []
    for dy in range(kh):
        row = []
        for dx_ in range(kw):
            sl = lax.slice(
                xp, (0, dy, dx_, 0),
                (xp.shape[0], dy + stride * (oh - 1) + 1,
                 dx_ + stride * (ow - 1) + 1, xp.shape[3]),
                (1, stride, stride, 1))
            row.append(jnp.einsum("nhwc,nhwd->cd", sl, g,
                                  preferred_element_type=jnp.float32))
        rows.append(jnp.stack(row, 0))
    dk = jnp.stack(rows, 0).astype(kernel.dtype)
    return dx.astype(x.dtype), dk


conv_grad_shift.defvjp(_cgs_fwd, _cgs_bwd)
