"""Benchmark: flagship RestormerRefFusion forward throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (round 2): the reference fps harness
(models/archs/nafnet_arch_utils.py:313-349) times N synced forwards; through
this rig's TPU relay a per-iteration sync costs ~29 ms of tunnel overhead,
which is not device time.  So the timed unit here is a device-side chain of
ITERS forwards (lax.fori_loop feeding each output back as the next input —
same shapes), fetched once; tunnel overhead amortizes to <1 ms/image.
REPEATS repetitions give a dispersion estimate (stderr printed to stderr).

Baseline for vs_baseline: BASELINE.json's implied target of reference-GPU
class throughput at 512 px; the repo publishes no number (SURVEY.md §6), so
vs_baseline reports against an A100 PyTorch estimate of ~1.3 img/s for
full-size RestormerRefFusion at 512 px fp32.
"""

import json
import os
import sys
import time

# The fused whole-TransformerBlock kernel is the measured-fastest
# configuration (BENCH_NOTES.md round 3: 152.5 -> 125.3 ms/image);
# selection is an explicit constructor arg below.  TDR_FUSED_TBLOCK=0
# here (entry-level override) to compare against the XLA op path.
FUSED = os.environ.get("TDR_FUSED_TBLOCK", "1") in ("1", "true", "on")
# Local AOT TPU compiles fail on this rig (libtpu build mismatch between
# the client wheel and the relay terminal); the relay-side compiler is the
# only working path, so pin it even if the launcher stripped the base env.
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
# Persistent compile cache: the full-model compile is ~10 min through the
# relay; cache it on disk so a re-run (or the driver's run after a session
# warmed it) starts in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 1.3  # estimated reference throughput (see docstring)

SIZE = 512
BATCH = 1
ITERS = 20
REPEATS = 3


def main():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16, fused=FUSED,
    )
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)

    # params/ref as jit ARGUMENTS, not closures: the relay serializes
    # closed-over device arrays into the compile request body, which can
    # blow its size limit (HTTP 413) on a cold compile cache
    def chain(params, lq, ref):
        def body(_, y):
            return model.apply(params, y, ref).astype(lq.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, lq))

    fn = jax.jit(chain)
    # measure fixed fetch overhead with a trivial program
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
    var = sum((t - mean) ** 2 for t in times) / max(len(times) - 1, 1)
    stderr = (var / len(times)) ** 0.5
    imgs_per_sec = 1.0 / mean
    print(
        f"per-image {mean * 1e3:.1f} ms +/- {stderr * 1e3:.2f} "
        f"(device-chained x{ITERS}, {REPEATS} repeats, "
        f"fetch overhead {overhead * 1e3:.1f} ms excluded)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"restormer_reffusion_fwd_{SIZE}px_imgs_per_sec",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
