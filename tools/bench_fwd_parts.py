"""Decompose the flagship RestormerRefFusion FORWARD (bench.py's 512 px
metric) into stages on the real chip, to find where the remaining
milliseconds live:

  full      — whole model.apply (the bench.py unit)
  masa      — masa encoder pair + match + warp forward alone
  masa_enc  — masa encoder pair forward alone

full - masa ~= trunk transformer levels + fusion blocks.

Usage: python tools/bench_fwd_parts.py [part ...]   (default: all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FUSED = os.environ.get("TDR_FUSED_TBLOCK", "1") in ("1", "true", "on")
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

SIZE = int(os.environ.get("TDR_BENCH_SIZE", "512"))
ITERS = 10
REPEATS = 3


def timed(fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "full", "masa", "masa_enc"]

    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)

    # non-loop-invariant chains (see bench_train_parts.py)
    if "full" in parts:
        model = RestormerRefFusion(
            dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
            heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
            reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
            dtype=jnp.bfloat16, fused=FUSED)
        params = jax.jit(model.init)(key, lq, ref)

        def full_chain(p, lq, ref):
            def body(_, y):
                return model.apply(p, y, ref).astype(lq.dtype)
            return jnp.sum(jax.lax.fori_loop(0, ITERS, body, lq))
        t = timed(full_chain, params, lq, ref)
        print(json.dumps({"part": "full_fwd", "ms": round(t * 1e3, 2)}),
              flush=True)

    if "masa" in parts or "masa_enc" in parts:
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)
        from textualdegremoval_tpu.ops import masa_match_and_warp

        enc = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams = jax.jit(enc.init)(key, lq)

    if "masa" in parts:
        def masa_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                feat_lq, feat_ref = masa_encode_pair(
                    lambda x: enc.apply(ep, x), lq_i, ref)
                warp = masa_match_and_warp(feat_lq[-1], feat_ref,
                                           lr_block_size=8)
                s = sum(jnp.sum(jnp.abs(w.astype(jnp.float32)))
                        for w in warp)
                return (lq_i + (s * 1e-12).astype(lq_i.dtype), acc + s)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(masa_chain, eparams, lq, ref)
        print(json.dumps({"part": "masa_fwd", "ms": round(t * 1e3, 2)}),
              flush=True)

    if "masa_enc" in parts:
        def enc_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                feat_lq, feat_ref = masa_encode_pair(
                    lambda x: enc.apply(ep, x), lq_i, ref)
                s = sum(jnp.sum(jnp.abs(f.astype(jnp.float32)))
                        for f in feat_lq + feat_ref)
                return (lq_i + (s * 1e-12).astype(lq_i.dtype), acc + s)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(enc_chain, eparams, lq, ref)
        print(json.dumps({"part": "masa_enc_fwd", "ms": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
