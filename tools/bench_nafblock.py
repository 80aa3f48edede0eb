"""Standalone whole-NAFBlock kernel benchmark (fused vs XLA path).

Chained on-device protocol (relay-safe, see BENCH_NOTES.md): each timed
unit is ITERS block applications feeding output->input via lax.fori_loop,
fetched once.  Run on the TPU rig:

    python tools/bench_nafblock.py [dim] [H] [W]

Defaults exercise the GoPro flagship's dominant configuration: the 28
deepest-encoder-level blocks (dim 512 at 1/8 resolution of 512 px).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 10
REPEATS = 3


def chain(fn, params, x, iters=ITERS):
    def body(_, y):
        return fn(params, y).astype(x.dtype)
    return jnp.sum(jax.lax.fori_loop(0, iters, body, x))


def timed(fn, params, x):
    # params as a jit argument, not a closure: the relay serializes
    # closed-over device arrays into the compile request body (HTTP 413)
    f = jax.jit(lambda p, x: chain(fn, p, x))
    float(f(params, x))  # compile + warm
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(params, x))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    from textualdegremoval_tpu.models.layers import NAFBlock

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    hgt = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    wdt = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    x = jax.random.normal(jax.random.PRNGKey(0), (1, hgt, wdt, dim),
                          jnp.bfloat16)
    xla_blk = NAFBlock(dim, dtype=jnp.bfloat16, fused=False)
    params = jax.jit(xla_blk.init)(jax.random.PRNGKey(1),
                                   x.astype(jnp.float32))
    fused_blk = NAFBlock(dim, dtype=jnp.bfloat16, fused=True)

    t_xla = timed(lambda p, y: xla_blk.apply(p, y), params, x)
    print(f"xla   nafblock dim={dim} {hgt}x{wdt}: {t_xla * 1e3:.3f} ms")
    t_fused = timed(lambda p, y: fused_blk.apply(p, y), params, x)
    print(f"fused nafblock dim={dim} {hgt}x{wdt}: {t_fused * 1e3:.3f} ms  "
          f"({t_xla / t_fused:.2f}x)")

    # parity spot check on-device (bf16 tolerance)
    a = jax.jit(xla_blk.apply)(params, x).astype(jnp.float32)
    b = jax.jit(fused_blk.apply)(params, x).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"max rel err fused vs xla: {err:.2e}")


if __name__ == "__main__":
    main()
