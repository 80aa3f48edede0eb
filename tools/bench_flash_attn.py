"""Probe: Pallas TPU flash attention vs jax.nn.dot_product_attention at the
SD 2.1 UNet's self-attention shapes (512 px latents, CFG batch 2).

The XLA path materializes the (seq, seq) logits per head; at seq 4096 that
is ~167 MB/layer of HBM traffic in bf16.  Decide whether routing UNet
self-attention through the streaming flash kernel moves the DDIM
(2.31 s/img) and i2t/TR train-step metrics.

Methodology: device-side chain (lax.fori_loop feeding the output back as
the next q), fetched once — the rig's TPU relay makes per-iteration sync
timing meaningless (bench.py docstring).

Usage: python tools/bench_flash_attn.py [--bwd]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention)

# (seq, heads): SD 2.1-base at 512px — 64x64 @320ch (5 heads of 64),
# 32x32 @640ch, 16x16 @1280ch, mid 8x8 @1280ch.
SHAPES = [(4096, 5), (1024, 10), (256, 20), (64, 20)]
B, D = 2, 64
ITERS = 50
REPEATS = 3


_OVERHEAD = None


def _fetch_overhead(x):
    """Per-fetch tunnel overhead (block_until_ready is a relay no-op;
    only a scalar fetch round-trips — same protocol as bench.py)."""
    global _OVERHEAD
    if _OVERHEAD is None:
        tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
        float(tiny(x))
        t0 = time.perf_counter()
        for _ in range(5):
            float(tiny(x))
        _OVERHEAD = (time.perf_counter() - t0) / 5
    return _OVERHEAD


def chain_time(step, q, k, v):
    """ms per step of a device-side ITERS-chain, scalar-fetched."""

    @jax.jit
    def chained(q, k, v):
        def body(_, qq):
            return step(qq, k, v).astype(q.dtype)
        return jnp.sum(lax.fori_loop(0, ITERS, body, q)
                       .astype(jnp.float32))

    overhead = _fetch_overhead(q)
    float(chained(q, k, v))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chained(q, k, v))
        best = min(best,
                   (time.perf_counter() - t0 - overhead) / ITERS * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--seq", type=int, default=0,
                    help="only this q_seq_len (0 = all)")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    for seq, heads in SHAPES:
        if args.seq and seq != args.seq:
            continue
        ks = jax.random.split(key, 3)
        # BNHD layout (what the model carries)
        q, k, v = (jax.random.normal(kk, (B, seq, heads, D), jnp.bfloat16)
                   for kk in ks)
        blk = min(512, seq)

        def xla_path(q, k, v):
            return jax.nn.dot_product_attention(q, k, v)

        def flash_path(q, k, v, blk=blk):
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk,
                block_b=1, block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_q_dkv=blk, block_k_dkv=blk,
                block_q_dq=blk, block_k_dq=blk, block_k_major_dq=blk)
            o = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), sm_scale=D ** -0.5,
                block_sizes=bs)
            return o.transpose(0, 2, 1, 3)

        if args.bwd:
            def grad_step(f):
                def loss(qq, kk_, vv):
                    return jnp.sum(f(qq, kk_, vv).astype(jnp.float32) ** 2)
                g = jax.grad(loss, argnums=(0, 1, 2))

                def step(qq, kk_, vv):
                    gq, gk, gv = g(qq, kk_, vv)
                    return gq + gk + gv
                return step
            t_x = chain_time(grad_step(xla_path), q, k, v)
            t_f = chain_time(grad_step(flash_path), q, k, v)
        else:
            t_x = chain_time(xla_path, q, k, v)
            t_f = chain_time(flash_path, q, k, v)
        ox = jax.jit(xla_path)(q, k, v).astype(jnp.float32)
        of = jax.jit(flash_path)(q, k, v).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ox - of)))
        print(f"seq={seq:5d} h={heads:2d}  xla {t_x:7.3f} ms   "
              f"flash {t_f:7.3f} ms   speedup {t_x / t_f:5.2f}x   "
              f"max|d|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
