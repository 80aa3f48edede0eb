"""Decompose the guided-restoration train step (tools/bench_train.py
643.9 ms @ 384px b1) into stages on the real chip:

  fwd        — loss only (fused-kernel forward)
  masa       — masa_encode+match+warp fwd+bwd alone
  full       — the whole train step (same as bench_train)

Usage: python tools/bench_train_parts.py [part ...]   (default: all)
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

SIZE = 384
ITERS = 5
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
    from textualdegremoval_tpu.losses import l1_loss

    parts = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "fwd", "fwdbwd", "masa", "masa_enc"]

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16, fused=FUSED)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    gt = jax.random.normal(key, (1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)["params"]

    def loss(p, lq, ref, gt):
        pred = model.apply({"params": p}, lq, ref)
        if isinstance(pred, (list, tuple)):
            pred = pred[-1]
        return l1_loss(pred.astype(jnp.float32), gt)

    # every chain feeds the iteration's scalar back into the inputs so the
    # loop body is NOT loop-invariant (XLA hoists invariant bodies out of
    # fori_loop and the per-iteration time reads ITERS-times too small)
    if "fwd" in parts:
        def fwd_chain(p, lq, ref, gt):
            def body(_, carry):
                lq_i, acc = carry
                l = loss(p, lq_i, ref, gt)
                return (lq_i + (l * 1e-12).astype(lq_i.dtype), acc + l)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(fwd_chain, params, lq, ref, gt)
        print(json.dumps({"part": "fwd_loss", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "fwdbwd" in parts:
        def fb_chain(p, lq, ref, gt):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(loss)(p, lq_i, ref, gt)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(fb_chain, params, lq, ref, gt)
        print(json.dumps({"part": "fwd_bwd", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "masa" in parts:
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)
        from textualdegremoval_tpu.ops import masa_match_and_warp

        enc = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams = jax.jit(enc.init)(key, lq)

        def masa_loss(ep, lq, ref):
            feat_lq, feat_ref = masa_encode_pair(
                lambda x: enc.apply(ep, x), lq, ref)
            warp = masa_match_and_warp(feat_lq[-1], feat_ref,
                                       lr_block_size=8)
            return sum(jnp.sum(jnp.abs(w.astype(jnp.float32)))
                       for w in warp)

        def masa_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(masa_loss)(ep, lq_i, ref)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(masa_chain, eparams, lq, ref)
        print(json.dumps({"part": "masa_fwd_bwd", "ms": round(t * 1e3, 1)}),
              flush=True)

    if "masa_enc" in parts:
        from textualdegremoval_tpu.models.layers import (
            MASAEncoder, masa_encode_pair)

        enc2 = MASAEncoder(48, (4, 4, 4, 4), 4, jnp.bfloat16)
        eparams2 = jax.jit(enc2.init)(key, lq)

        def enc_loss(ep, lq, ref):
            feat_lq, feat_ref = masa_encode_pair(
                lambda x: enc2.apply(ep, x), lq, ref)
            return sum(jnp.sum(jnp.abs(f.astype(jnp.float32)))
                       for f in feat_lq + feat_ref)

        def enc_chain(ep, lq, ref):
            def body(_, carry):
                lq_i, acc = carry
                l, g = jax.value_and_grad(enc_loss)(ep, lq_i, ref)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b)).astype(jnp.float32),
                    g, jnp.zeros(()))
                return (lq_i + (l * 1e-12).astype(lq_i.dtype),
                        acc + l + gsum)
            return jax.lax.fori_loop(0, ITERS, body, (lq, jnp.zeros(())))[1]
        t = timed(enc_chain, eparams2, lq, ref)
        print(json.dumps({"part": "masa_enc_fwd_bwd",
                          "ms": round(t * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
