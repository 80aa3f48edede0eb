"""Benchmark: DiffIR-style NAFNetDynamicFusion forward throughput on one
chip (text-embedding-conditioned restoration, reference
network_nafnet_guided_diffir_arch.py NAFNetDynamicFusion).

Chained on-device protocol (relay-safe, BENCH_NOTES.md): the conditioning
embed (20 x 1024 pseudo-words, the I2T mapper output shape) is fixed
across iterations like a real restoration batch over one guidance image.

    python tools/bench_diffir.py [size] [batch]
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

ITERS = 20
REPEATS = 3


def main():
    from textualdegremoval_tpu.models.nafnet_dynamic import (
        NAFNetDynamicFusion)

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    # reference ptflops check config: width 32, enc [1,1,1,28]
    # (network_nafnet_guided_diffir_arch.py:656-679)
    model = NAFNetDynamicFusion(width=32, enc_blk_nums=(1, 1, 1, 28),
                                dec_blk_nums=(1, 1, 1, 1),
                                middle_blk_num=1, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    embed = jax.random.normal(key, (batch, 20, 1024), jnp.float32)
    params = jax.jit(model.init)(key, lq, embed)

    def chain(params, lq, embed):
        def body(_, y):
            return model.apply(params, y, embed).astype(lq.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, lq))

    fn = jax.jit(chain)
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(tiny(lq))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(lq))
    overhead = (time.perf_counter() - t0) / 5

    float(fn(params, lq, embed))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(params, lq, embed))
        times.append((time.perf_counter() - t0 - overhead) / ITERS / batch)
    per_img = min(times)
    print(f"per-image {per_img * 1e3:.1f} ms (device-chained x{ITERS}, "
          f"{REPEATS} repeats, fetch overhead {overhead * 1e3:.1f} ms "
          f"excluded)", file=sys.stderr)
    print(json.dumps({
        "metric": f"nafnet_dynamic_diffir_fwd_{size}px_imgs_per_sec",
        "value": round(1.0 / per_img, 4),
        "unit": "images/sec/chip",
    }))


if __name__ == "__main__":
    main()
