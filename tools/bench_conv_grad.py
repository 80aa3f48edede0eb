"""Probe: dense 3x3 conv backward — XLA autodiff vs shift-matmul filter grad.

The MASA encoder (models/layers.py MASAEncoder) is plain 3x3 convs + ReLU
residual blocks; its backward is the largest remaining mass in the 384 px
train step (BENCH_NOTES round 3: 52.8 ms of the 108 ms masa fwd+bwd).  XLA
lowers the dense filter gradient through the conv emitter with the batch
axis as the contraction — this probe measures that against an explicit
formulation: dW[i,j] = shifted(x)[i,j] ^T @ g as 9 MXU matmuls (einsum with
f32 accumulation), dx kept on XLA's standard transposed conv.

Shapes: the flagship encoder levels at 384 px, batched lq+ref pair (N=2)
and the in-model batched call (N=2 per train image).

Usage: python tools/bench_conv_grad.py
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

ITERS = 10
REPEATS = 3

# (H, C_in, C_out, stride) — the flagship MASA encoder at 384 px input:
# L1 384px 3->48 s1 + 4 resblocks 48->48; L2 192px 48->96 s2 + 4 blocks;
# L3 96px 96->192 s2 + 4; L4 48px 192->384 s2 + 4.  N=2 (lq+ref batch).
SHAPES = [
    (384, 48, 48, 1),
    (192, 96, 96, 1),
    (96, 192, 192, 1),
    (48, 384, 384, 1),
    (384, 48, 96, 2),
    (192, 96, 192, 2),
    (96, 192, 384, 2),
]


def timed(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def loss_xla(w, x, g, stride):
    return jnp.sum(conv(x, w, stride).astype(jnp.float32) * g)


def dw_shift(x, g, stride):
    """dW[i,j,ci,co] = sum_nhw xp[n, i+s*h, j+s*w, ci] * g[n,h,w,co]."""
    oh, ow = g.shape[1], g.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for i in range(3):
        row = []
        for j in range(3):
            sl = xp[:, i : i + stride * oh : stride,
                    j : j + stride * ow : stride, :]
            row.append(jnp.einsum("nhwc,nhwd->cd", sl, g,
                                  preferred_element_type=jnp.float32))
        taps.append(jnp.stack(row, 0))
    return jnp.stack(taps, 0)


def main():
    key = jax.random.PRNGKey(0)
    for h, ci, co, s in SHAPES:
        oh = h // s
        x = jax.random.normal(key, (2, h, h, ci), jnp.bfloat16)
        g = jax.random.normal(key, (2, oh, oh, co), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32)

        # XLA autodiff filter grad (the emitter lowering)
        def xla_chain(w, x, g):
            def body(_, carry):
                acc, xx = carry
                dw = jax.grad(loss_xla)(w, xx, g, s)
                acc = acc + jnp.sum(jnp.abs(dw))
                return (acc, xx + (acc * 1e-20).astype(xx.dtype))
            return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))[0]

        # shift-matmul filter grad
        def shift_chain(w, x, g):
            def body(_, carry):
                acc, xx = carry
                dw = dw_shift(xx, g, s)
                acc = acc + jnp.sum(jnp.abs(dw))
                return (acc, xx + (acc * 1e-20).astype(xx.dtype))
            return jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))[0]

        t_xla = timed(xla_chain, w, x, g)
        t_shift = timed(shift_chain, w, x, g)

        # parity
        dw_a = jax.jit(jax.grad(loss_xla), static_argnums=3)(w, x, g, s)
        dw_b = jax.jit(dw_shift, static_argnums=2)(x, g, s)
        err = float(jnp.max(jnp.abs(dw_a - dw_b)) /
                    (jnp.max(jnp.abs(dw_a)) + 1e-9))
        print(json.dumps({
            "shape": f"{h}px {ci}->{co} s{s}",
            "xla_dw_ms": round(t_xla * 1e3, 3),
            "shift_dw_ms": round(t_shift * 1e3, 3),
            "speedup": round(t_xla / t_shift, 2),
            "rel_err": f"{err:.2e}",
        }), flush=True)


if __name__ == "__main__":
    main()
