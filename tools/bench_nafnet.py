"""NAFNetRefFusion (GoPro deblur flagship, BASELINE config 2) forward
throughput on one chip, fused-NAFBlock kernel on/off.

Chained on-device protocol as bench.py.  Prints one JSON line:
  {"metric": "nafnet_reffusion_fwd_512px_imgs_per_sec", ...}

Usage: python tools/bench_nafnet.py [--xla]   (--xla forces the module path)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FUSED = ("--xla" not in sys.argv and
         os.environ.get("TDR_FUSED_NAFBLOCK", "1") in ("1", "true", "on"))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

SIZE = 512
BATCH = 1
ITERS = 20
REPEATS = 3


def main():
    from textualdegremoval_tpu.models.nafnet import NAFNetRefFusion

    model = NAFNetRefFusion(dtype=jnp.bfloat16, fused=FUSED)  # GoPro yaml defaults
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)

    # params/ref MUST be jit arguments, not closures: the relay serializes
    # closed-over device arrays into the compile request body, which blows
    # its size limit (HTTP 413) on full-size models
    def chain(params, lq, ref):
        def body(_, y):
            return model.apply(params, y, ref).astype(lq.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, lq))

    fn = jax.jit(chain)
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(tiny(lq))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(lq))
    overhead = (time.perf_counter() - t0) / 5

    float(fn(params, lq, ref))  # compile + warm
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(params, lq, ref))
        times.append((time.perf_counter() - t0 - overhead) / (ITERS * BATCH))
    mean = sum(times) / len(times)
    imgs_per_sec = 1.0 / mean
    tag = "xla" if "--xla" in sys.argv else "fused"
    print(f"[{tag}] per-image {mean * 1e3:.1f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": f"nafnet_reffusion_fwd_{SIZE}px_imgs_per_sec",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
    }))


if __name__ == "__main__":
    main()
