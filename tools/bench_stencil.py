"""Microbenchmark: in-kernel depthwise-3x3 stencil formulations on TPU.

The fused TransformerBlock kernel is VPU-bound on its dwconv stencils
(BENCH_NOTES round 3 roofline); this compares formulations of the
(t+2, W, ch) -> (t, W, ch) row-tile stencil in isolation, looped in-kernel
to amortize grid overhead:

  concat  — current production form (ops/pallas/tblock._dw3x3_rows):
            2 hoisted edge-padded copies via concatenate, 9 FMAs
  roll    — pltpu.roll for the x-shifts + iota edge masks
  nocopy  — 9 FMAs slicing rows only, x-shift via concatenate per tap
            (the pre-hoist form, 6 copies; sanity lower bound)
  mulonly — 9 FMAs with NO x-shift at all (upper bound: pure FMA cost,
            wrong result, measures how much the shifts cost)

Run on the TPU rig:  python tools/bench_stencil.py [W] [ch] [t] [reps]
"""

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

ITERS = 3000  # in-kernel repetitions


def _shift_concat(hid, w):
    z = jnp.zeros((hid.shape[0], 1, hid.shape[2]), hid.dtype)
    return (jnp.concatenate([z, hid[:, : w - 1]], axis=1),
            hid,
            jnp.concatenate([hid[:, 1:], z], axis=1))


def _shift_roll(hid, w):
    col = jax.lax.broadcasted_iota(jnp.int32, hid.shape, 1)
    left = jnp.where(col == 0, 0, pltpu.roll(hid, 1, 1))
    right = jnp.where(col == w - 1, 0, pltpu.roll(hid, w - 1, 1))
    return (left.astype(hid.dtype), hid, right.astype(hid.dtype))


def make_kernel(variant, t, w, ch):
    def kernel(x_ref, w_ref, o_ref):
        def body(_, carry):
            hid = carry
            if variant in ("concat", "roll"):
                hs = (_shift_concat if variant == "concat"
                      else _shift_roll)(hid, w)
                out = jnp.zeros((t, w, ch), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        tap = w_ref[dy * 3 + dx: dy * 3 + dx + 1, :]
                        out = out + hs[dx][dy:dy + t] * tap[None]
            elif variant == "nocopy":
                z = jnp.zeros((t, 1, ch), hid.dtype)
                out = jnp.zeros((t, w, ch), jnp.float32)
                for dy in range(3):
                    rows = hid[dy:dy + t]
                    hs = (jnp.concatenate([z, rows[:, : w - 1]], axis=1),
                          rows,
                          jnp.concatenate([rows[:, 1:], z], axis=1))
                    for dx in range(3):
                        tap = w_ref[dy * 3 + dx: dy * 3 + dx + 1, :]
                        out = out + hs[dx] * tap[None]
            elif variant == "bf16acc":
                # bf16 taps, bf16 accumulator: halves VPU element width
                hs = _shift_concat(hid, w)
                out = jnp.zeros((t, w, ch), jnp.bfloat16)
                for dy in range(3):
                    for dx in range(3):
                        tap = w_ref[dy * 3 + dx: dy * 3 + dx + 1, :].astype(
                            jnp.bfloat16)
                        out = out + hs[dx][dy:dy + t] * tap[None]
            elif variant == "mulonly_bf16":
                out = jnp.zeros((t, w, ch), jnp.bfloat16)
                for dy in range(3):
                    for dx in range(3):
                        tap = w_ref[dy * 3 + dx: dy * 3 + dx + 1, :].astype(
                            jnp.bfloat16)
                        out = out + hid[dy:dy + t] * tap[None]
            else:  # mulonly
                out = jnp.zeros((t, w, ch), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        tap = w_ref[dy * 3 + dx: dy * 3 + dx + 1, :]
                        out = out + hid[dy:dy + t] * tap[None]
            # feed back so the loop isn't dead-code-eliminated
            nxt = jnp.concatenate(
                [hid[:2], out.astype(hid.dtype)], axis=0)
            return nxt
        final = jax.lax.fori_loop(0, ITERS, body, x_ref[...])
        o_ref[...] = final[2:].astype(o_ref.dtype)

    return kernel


def run(variant, t, w, ch, overhead):
    x = jax.random.normal(jax.random.PRNGKey(0), (t + 2, w, ch),
                          jnp.bfloat16)
    taps = jax.random.normal(jax.random.PRNGKey(1), (9, ch), jnp.float32)
    f = jax.jit(lambda x, taps: jnp.sum(pl.pallas_call(
        make_kernel(variant, t, w, ch),
        out_shape=jax.ShapeDtypeStruct((t, w, ch), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, taps).astype(jnp.float32)))
    float(f(x, taps))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, taps))
        ts.append((time.perf_counter() - t0 - overhead) / ITERS)
    flops = 2 * 9 * t * w * ch
    best = min(ts)
    print(f"{variant:8s} t={t} W={w} ch={ch}: {best * 1e6:8.2f} us/stencil "
          f"({flops / best / 1e12:.3f} TF/s effective)")
    return best


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    # fixed per-fetch overhead of the relay (measured with a trivial jit)
    tiny = jax.jit(lambda v: jnp.sum(v * 2.0))
    z = jnp.ones((8, 128), jnp.float32)
    float(tiny(z))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(z))
    overhead = (time.perf_counter() - t0) / 5
    print(f"fetch overhead: {overhead * 1e3:.2f} ms")
    for variant in ("concat", "bf16acc", "mulonly", "mulonly_bf16"):
        try:
            run(variant, t, w, ch, overhead)
        except Exception as e:
            print(f"{variant}: FAIL {str(e)[:120]}")


if __name__ == "__main__":
    main()
