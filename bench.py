"""Benchmark: flagship RestormerRefFusion forward throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol mirrors the reference fps harness
(models/archs/nafnet_arch_utils.py:313-349): warmup then timed loop with
device sync.  Baseline for vs_baseline: BASELINE.json's implied target of
reference-GPU-class throughput at 512 px; the repo publishes no number
(SURVEY.md §6), so vs_baseline reports against an A100 PyTorch estimate of
~1.3 img/s for RestormerRefFusion at 512 px fp32 (full-size model, two
encoder passes + trunk).
"""

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput (img/s/GPU) for full RestormerRefFusion at
# 512px; see module docstring.
BASELINE_IMGS_PER_SEC = 1.3

SIZE = 512
BATCH = 1
WARMUP = 3
ITERS = 10


def main():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)

    fwd = jax.jit(model.apply)
    # Force a scalar fetch per iteration: through the remote-TPU relay,
    # block_until_ready on a queued buffer under-reports, so each timed call
    # round-trips a reduction of the output.
    for _ in range(WARMUP):
        float(jnp.sum(fwd(params, lq, ref)))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(jnp.sum(fwd(params, lq, ref)))
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": f"restormer_reffusion_fwd_{SIZE}px_imgs_per_sec",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
