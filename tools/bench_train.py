"""Guided-restoration training step on the real chip (BASELINE item 5).

Times OUR full jitted train step (fwd + bwd + AdamW with the masa/trunk LR
split + EMA) for the flagship RestormerRefFusion at the reference's
gt_size (384, config 003) in bf16-activation / f32-param mixed precision.
The reference trains this at batch 8/GPU on 4 A100s, fp32.

Protocol: device-side chain of ITERS steps via lax.fori_loop carrying the
TrainState, fetched once (see BENCH_NOTES.md).  Prints one JSON line:
  {"metric": "restoration_train_step_384px_b<B>", "value": <ms>, ...}

Usage: python tools/bench_train.py [batch] [size] [--remat] [--frozen]

--frozen measures the param_fix_iterations-phase step (masa backward
structurally pruned, train/trainer.py make_train_step masa_frozen).
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

ITERS = 5
REPEATS = 3


def main():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion
    from textualdegremoval_tpu.train.trainer import (
        build_optimizer, create_train_state, make_train_step)
    from textualdegremoval_tpu.train.schedules import (
        cosine_annealing_restart_cyclic_lr)
    from textualdegremoval_tpu.losses import l1_loss

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    remat = "--remat" in sys.argv
    frozen = "--frozen" in sys.argv

    model = RestormerRefFusion(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), nf=48, ext_n_blocks=(4, 4, 4, 4),
        reffusion_n_blocks=(2, 2, 2, 2), lr_block_size=8,
        dtype=jnp.bfloat16, fused=FUSED,
        bwd_mode="remat" if remat else None)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    ref = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    gt = jax.random.normal(key, (batch, size, size, 3), jnp.float32)

    params = jax.jit(model.init)(key, lq[:1], ref[:1])["params"]
    sched = cosine_annealing_restart_cyclic_lr(
        2e-4, periods=[306000, 694000], restart_weights=[1, 1],
        eta_mins=[3e-4, 1e-6])
    ref_sched = cosine_annealing_restart_cyclic_lr(
        1e-4, periods=[306000, 694000], restart_weights=[1, 1],
        eta_mins=[3e-4, 1e-6])
    tx = build_optimizer(params, sched, ref_sched, grad_clip=0.01)
    state = create_train_state(params, tx)
    step = make_train_step(model.apply, l1_loss, tx, donate=False,
                           remat=remat, masa_frozen=frozen)

    # state/batch as jit ARGUMENTS (relay request-size limit)
    def chain(state, lq, ref, gt):
        def body(_, carry):
            s, _ = carry
            s2, metrics = step(s, {"lq": lq, "ref": ref, "gt": gt})
            return (s2, metrics["l_pix"])
        out = jax.lax.fori_loop(0, ITERS, body,
                                (state, jnp.zeros((), jnp.float32)))
        return out[1]

    fn = jax.jit(chain)
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(tiny(lq))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(lq))
    overhead = (time.perf_counter() - t0) / 5

    print("compiling the chained train step...", file=sys.stderr)
    float(fn(state, lq, ref, gt))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(state, lq, ref, gt))
        times.append((time.perf_counter() - t0 - overhead) / ITERS)
    mean = sum(times) / len(times)
    print(f"train step: {mean * 1e3:.1f} ms (batch {batch} @ {size}px, "
          f"remat={remat}, chained x{ITERS}, {REPEATS} repeats)",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"restoration_train_step_{size}px_b{batch}"
                  + ("_frozen" if frozen else ""),
        "value": round(mean * 1e3, 1),
        "unit": "ms/step",
        "steps_per_sec": round(1.0 / mean, 3),
    }))


if __name__ == "__main__":
    main()
