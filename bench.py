"""Benchmark suite: the framework's headline numbers on one chip.

Prints ONE JSON line.  The primary metric (driver contract) is the flagship
RestormerRefFusion forward; the ``extra`` field carries the rest of the
round-record suite (VERDICT r4 item 1b) so every round's BENCH_rN.json
captures training and the other model families, not just the flagship:

  {"metric": "restormer_reffusion_fwd_512px_imgs_per_sec", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N,
   "extra": {"nafnet_reffusion_fwd_512px": {...},
             "restoration_train_step_384px_b1": {...},
             "ddim_cfg_100step_512px": {...}}}

Protocol (round 2): the reference fps harness
(models/archs/nafnet_arch_utils.py:313-349) times N synced forwards; through
this rig's TPU relay a per-iteration sync costs ~29 ms of tunnel overhead,
which is not device time.  So the timed unit here is a device-side chain of
ITERS runs (lax.fori_loop feeding each output back as the next input — same
shapes), fetched once; tunnel overhead amortizes to <1 ms/image.

Baselines for vs_baseline (BASELINE.json publishes none — SURVEY.md §6):
* flagship fwd: A100 PyTorch estimate ~1.3 img/s (BENCH_NOTES.md derivation)
* NAFNet fwd: A100 estimate ~2.7 img/s (BENCH_NOTES.md derivation)
* DDIM: reference protocol >=10 s/image (100 steps x 2 UNet fwd, fp16 GPU,
  main_generate_reference.py:101) — vs_baseline = 10 / ours.
* train step: no derived A100 number -> no vs_baseline field.

Models are constructed with fused=None: the suite measures the PRODUCT
default (auto -> fused kernels ON on TPU backends, models/layers.py), so a
regression in the default path shows up here, not just in tuned tools.
$TDR_FUSED_TBLOCK still overrides.  TDR_BENCH_SUITE=0 runs the primary
metric only.
"""

import json
import os
import sys
import time

# Local AOT TPU compiles fail on this rig (libtpu build mismatch between
# the client wheel and the relay terminal); the relay-side compiler is the
# only working path, so pin it even if the launcher stripped the base env.
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
# Persistent compile cache: the full-model compiles are minutes through the
# relay; cache on disk so a re-run (or the driver's run after a session
# warmed it) starts in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 1.3    # flagship A100 estimate (docstring)
NAFNET_BASELINE_IMGS_PER_SEC = 2.7
DDIM_BASELINE_S_PER_IMG = 10.0

SIZE = 512
BATCH = 1
ITERS = 20
REPEATS = 3

_OVERHEAD = None


def _fetch_overhead(x):
    """Fixed per-fetch tunnel overhead, measured once with a trivial jit."""
    global _OVERHEAD
    if _OVERHEAD is None:
        tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
        float(tiny(x))
        t0 = time.perf_counter()
        for _ in range(5):
            float(tiny(x))
        _OVERHEAD = (time.perf_counter() - t0) / 5
    return _OVERHEAD


def _time_chain(fn, args, iters, repeats, overhead):
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append((time.perf_counter() - t0 - overhead) / iters)
    mean = sum(times) / len(times)
    var = sum((t - mean) ** 2 for t in times) / max(len(times) - 1, 1)
    return mean, (var / len(times)) ** 0.5


def bench_flagship():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16)  # fused=None -> product auto default
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

    overhead = _fetch_overhead(lq)
    mean, stderr = _time_chain(jax.jit(chain), (params, lq, ref),
                               ITERS * BATCH, REPEATS, overhead)
    print(f"flagship fwd: per-image {mean * 1e3:.1f} ms +/- "
          f"{stderr * 1e3:.2f} (device-chained x{ITERS}, {REPEATS} repeats,"
          f" fetch overhead {overhead * 1e3:.1f} ms excluded)",
          file=sys.stderr)
    return 1.0 / mean


def bench_nafnet():
    from textualdegremoval_tpu.models.nafnet import NAFNetRefFusion

    # GoPro yaml defaults; the XLA module path is the measured-fastest for
    # NAFNet (BENCH_NOTES.md: fused whole-NAFBlock loses in-model)
    model = NAFNetRefFusion(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    ref = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq, ref)

    def chain(params, lq, ref):
        def body(_, y):
            return model.apply(params, y, ref).astype(lq.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, lq))

    mean, _ = _time_chain(jax.jit(chain), (params, lq, ref),
                          ITERS * BATCH, REPEATS, _fetch_overhead(lq))
    print(f"nafnet fwd: per-image {mean * 1e3:.1f} ms", file=sys.stderr)
    return {"value": round(1.0 / mean, 4), "unit": "images/sec/chip",
            "vs_baseline": round(1.0 / mean / NAFNET_BASELINE_IMGS_PER_SEC,
                                 3)}


def bench_train_step(batch=1, size=384, iters=5):
    """Full jitted train step (fwd+bwd+AdamW masa/trunk split+EMA) for the
    flagship at the reference's gt_size 384 (config 003 protocol,
    options/train_restoration/003_...yml:24-33), bf16 activations."""
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion
    from textualdegremoval_tpu.train.trainer import (
        build_optimizer, create_train_state, make_train_step)
    from textualdegremoval_tpu.train.schedules import (
        cosine_annealing_restart_cyclic_lr)
    from textualdegremoval_tpu.losses import l1_loss

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ref = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    gt = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(key, lq[:1], ref[:1])["params"]
    sched = cosine_annealing_restart_cyclic_lr(
        2e-4, periods=[306000, 694000], restart_weights=[1, 1],
        eta_mins=[3e-4, 1e-6])
    tx = build_optimizer(params, sched, sched, grad_clip=0.01)
    state = create_train_state(params, tx)
    step = make_train_step(model.apply, l1_loss, tx, donate=False)

    def chain(state, lq, ref, gt):
        def body(_, carry):
            s, _ = carry
            s2, metrics = step(s, {"lq": lq, "ref": ref, "gt": gt})
            return (s2, metrics["l_pix"])
        return jax.lax.fori_loop(
            0, iters, body, (state, jnp.zeros((), jnp.float32)))[1]

    mean, _ = _time_chain(jax.jit(chain), (state, lq, ref, gt),
                          iters, REPEATS, _fetch_overhead(lq))
    print(f"train step: {mean * 1e3:.1f} ms (b{batch} @ {size}px)",
          file=sys.stderr)
    return {"value": round(mean * 1e3, 1), "unit": "ms/step",
            "steps_per_sec": round(1.0 / mean, 3)}


def bench_ddim(steps=100, latent=64):
    """100-step DDIM CFG sampling, full-size SD 2.1 UNet (891M params,
    random-init — arithmetic identical to real weights), bf16, batch 1.
    Reference protocol: 2 UNet fwd per step at fp16
    (main_generate_reference.py:101)."""
    from textualdegremoval_tpu.models.unet import UNet2DCondition
    from textualdegremoval_tpu.diffusion.ddim import DDIMScheduler, cfg_sample

    unet = UNet2DCondition(dtype=jnp.bfloat16)
    sched = DDIMScheduler()
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (1, latent, latent, 4), jnp.float32)
    ctx = jax.random.normal(key, (1, 77, 1024), jnp.float32)
    t0 = jnp.zeros((2,), jnp.int32)
    lat2 = jnp.concatenate([lat, lat], axis=0)
    params = jax.jit(unet.init)(key, lat2, t0,
                                jnp.concatenate([ctx, ctx], axis=0))

    def sample(params, lat, cond, uncond):
        def eps_fn(l, t, c):
            return unet.apply(params, l, t, c)
        return jnp.sum(cfg_sample(eps_fn, sched, lat, cond, uncond,
                                  num_inference_steps=steps,
                                  guidance_scale=5.0))

    mean, _ = _time_chain(jax.jit(sample), (params, lat, ctx, ctx * 0),
                          1, REPEATS, _fetch_overhead(lat))
    print(f"ddim: {mean:.2f} s/image ({steps} steps, CFG)", file=sys.stderr)
    return {"value": round(mean, 3), "unit": "sec/image",
            "vs_baseline": round(DDIM_BASELINE_S_PER_IMG / mean, 3)}


def main():
    t_start = time.perf_counter()
    imgs_per_sec = bench_flagship()

    extra = {}
    if os.environ.get("TDR_BENCH_SUITE", "1") in ("1", "true", "on"):
        for name, fn in [
            ("nafnet_reffusion_fwd_512px", bench_nafnet),
            ("restoration_train_step_384px_b1", bench_train_step),
            ("ddim_cfg_100step_512px", bench_ddim),
        ]:
            try:
                extra[name] = fn()
            except Exception as e:  # a failed extra must not kill the record
                extra[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
                print(f"extra metric {name} failed: {e}", file=sys.stderr)

    print(f"suite wall time {time.perf_counter() - t_start:.0f}s",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"restormer_reffusion_fwd_{SIZE}px_imgs_per_sec",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
