"""Standalone chained-vs-per-block TransformerBlock benchmark.

Times an N-block stage as (a) N per-block fused kernels (tblock_fused) and
(b) the cross-block-fused chain (tblock_chain_fused), chained-protocol.

    python tools/bench_tblock_chain.py [dim] [H] [W] [heads] [nblocks]

TDR_TBLOCK_TILE overrides the row tile for BOTH paths.
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

ITERS = 10
REPEATS = 3


def timed(fn, ps, x):
    def chain(ps, x):
        def body(_, y):
            return fn(ps, y).astype(x.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    f = jax.jit(chain)
    float(f(ps, x))  # compile + warm
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(ps, x))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    from textualdegremoval_tpu.models.layers import TransformerBlock
    from textualdegremoval_tpu.ops.pallas.tblock import (
        tblock_fused, tblock_chain_fused)

    def extract_tblock(params):
        p = {
            "norm1_w": params["norm1"]["weight"],
            "norm2_w": params["norm2"]["weight"],
            "qkv": params["attn"]["qkv"]["kernel"],
            "qkv_dw": params["attn"]["qkv_dwconv"]["kernel"],
            "temperature": params["attn"]["temperature"],
            "proj": params["attn"]["project_out"]["kernel"],
            "gd_in": params["ffn"]["project_in"]["kernel"],
            "gd_dw": params["ffn"]["dwconv"]["kernel"],
            "gd_out": params["ffn"]["project_out"]["kernel"],
        }
        if "bias" in params["norm1"]:
            p["norm1_b"] = params["norm1"]["bias"]
            p["norm2_b"] = params["norm2"]["bias"]
        return p

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    hgt = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    wdt = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    heads = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    nblk = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    x = jax.random.normal(jax.random.PRNGKey(0), (1, hgt, wdt, dim),
                          jnp.bfloat16)
    blk = TransformerBlock(dim, heads, dtype=jnp.bfloat16, fused=False)
    ps = []
    for i in range(nblk):
        params = jax.jit(blk.init)(jax.random.PRNGKey(i + 1),
                                   x.astype(jnp.float32))["params"]
        ps.append(extract_tblock(params))
    ps = tuple(ps)

    def per_block(ps, y):
        for p in ps:
            y = tblock_fused(y, p, heads, "WithBias")
        return y

    def chained(ps, y):
        return tblock_chain_fused(y, ps, heads, "WithBias")

    t_pb = timed(per_block, ps, x)
    print(f"per-block x{nblk} dim={dim} {hgt}x{wdt} heads={heads}: "
          f"{t_pb * 1e3:.3f} ms")
    t_ch = timed(chained, ps, x)
    print(f"chained   x{nblk} dim={dim} {hgt}x{wdt} heads={heads}: "
          f"{t_ch * 1e3:.3f} ms  ({t_pb / t_ch:.2f}x)")

    a = jax.jit(per_block)(ps, x).astype(jnp.float32)
    b = jax.jit(chained)(ps, x).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"max rel err chained vs per-block: {err:.2e}")


if __name__ == "__main__":
    main()
