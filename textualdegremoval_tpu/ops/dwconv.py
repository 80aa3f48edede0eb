"""Depthwise KxK convolution as K^2 shifted fused-multiply-adds.

Why not ``lax.conv_general_dilated`` with ``feature_group_count=C``:
XLA-TPU lowers depthwise convs through a conv emitter whose layout wants
differ from the surrounding elementwise ops, so every instance pays
relayout copies on both sides — measured on the flagship RestormerRefFusion
at 512 px, the qkv_dwconv instances alone accounted for 16.2 GB of the
model's 126 GB HBM traffic against a ~5 GB in+out ideal, and a single
512px/288ch instance measured 2.77 ms (VPU stencil) vs 2.55 ms for this
formulation (BENCH_NOTES.md round 2).

The shift form is a chain of pure elementwise multiplies and adds over
statically shifted views.  XLA fuses the whole chain (plus whatever
elementwise neighbors surround it) into one loop: traffic approaches the
in+out ideal and no layout oscillation occurs.  Accumulation is f32 in
registers (products are cast up inside the fused loop), matching the conv
emitter's f32 accumulator, then cast back to the input dtype.

Parameter layout matches flax ``nn.Conv(features=C, kernel_size=(K, K),
feature_group_count=C)`` — HWIO kernel (K, K, 1, C) — so checkpoints are
interchangeable between the two formulations (asserted by
tests/test_ops_basic.py).

Reference semantics: torch ``nn.Conv2d(C, C, K, padding=K//2, groups=C)``
(network_restormer_guided_arch.py:229-233 and every other dconv in the
model zoo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dwconv_shift(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Depthwise KxK (odd K), stride 1, SAME zero padding.

    Args:
      x: (N, H, W, C).
      kernel: (K, K, 1, C) HWIO (nn.Conv layout) or (K, K, C).
      bias: optional (C,).
    Returns:
      (N, H, W, C) in x.dtype.
    """
    if kernel.ndim == 4:
        kernel = kernel[:, :, 0, :]
    ks = kernel.shape[0]
    p = ks // 2
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    k = kernel.astype(jnp.float32)
    acc = None
    for i in range(ks):
        for j in range(ks):
            tap = xp[:, i : i + h, j : j + w, :].astype(jnp.float32) * k[i, j]
            acc = tap if acc is None else acc + tap
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


# back-compat alias
dwconv3x3_shift = dwconv_shift


def _conv_dw(x, kernel):
    """lax depthwise conv, SAME zero padding, HWIO (K, K, 1, C) kernel."""
    import jax.lax as lax

    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1),
        ((kernel.shape[0] // 2,) * 2, (kernel.shape[1] // 2,) * 2),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def dwconv_grad_shift(x, kernel):
    """Depthwise KxK conv: conv-emitter FORWARD, shift-form BACKWARD.

    XLA's depthwise backward lowers the filter gradient through a conv
    emitter that measures ~4x slower than 9 shifted multiply-reduces
    (BENCH_NOTES.md round 3: 2.5 ms vs 0.6 ms per 384px/288ch instance on
    v5e).  dx is the transposed stencil (flipped taps over the padded
    output gradient); dk[i,j,c] = sum_p shifted(x)[p,c] * g[p,c].  Both
    accumulate in f32, matching the emitter's accumulator.

    x: (N, H, W, C); kernel: (K, K, 1, C) HWIO.  Returns x.dtype.
    """
    return _conv_dw(x, kernel)


def _dwgs_fwd(x, kernel):
    return _conv_dw(x, kernel), (x, kernel)


def _dwgs_bwd(res, g):
    x, kernel = res
    ks = kernel.shape[0]
    p = ks // 2
    h, w = x.shape[1], x.shape[2]
    kf = kernel[:, :, 0, :].astype(jnp.float32)
    gp = jnp.pad(g, ((0, 0), (p, p), (p, p), (0, 0)))
    dx = None
    for i in range(ks):
        for j in range(ks):
            t = gp[:, i : i + h, j : j + w, :].astype(jnp.float32) \
                * kf[ks - 1 - i, ks - 1 - j]
            dx = t if dx is None else dx + t
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    gf = g.astype(jnp.float32)
    dk = jnp.stack([
        jnp.stack([
            jnp.sum(xp[:, i : i + h, j : j + w, :].astype(jnp.float32) * gf,
                    axis=(0, 1, 2))
            for j in range(ks)], 0)
        for i in range(ks)], 0)[:, :, None, :]
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


dwconv_grad_shift.defvjp(_dwgs_fwd, _dwgs_bwd)
