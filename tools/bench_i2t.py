"""Measure the I2T / TR mapper training step on the real chip
(BASELINE item 4 and its TR sibling).

Reference protocol: main_train_i2t_mapping.py batch 4 + grad-accum 4 at
512 px, frozen SD 2.1 UNet/VAE/CLIP towers, trainable mapper + UNet global
K/V.  This times OUR jitted train step (diffusion/pipeline.py
make_guidance_train_step) with random-init towers at the real sizes — the
arithmetic is identical with real weights.

--tr measures the TR stage instead (main_train_tr_mapping.py:756-839):
frozen pretrained I2T mapper stacked with the trainable CleanMapper (the
module the reference's shipped optimizer bug forgot to train — SURVEY.md
§2.5 item 3); same towers, same batch protocol.

Protocol: device-side chain of ITERS steps via lax.fori_loop carrying
(params, opt_state), fetched once (the relay adds ~28.5 ms per host fetch;
see BENCH_NOTES.md).  Prints one JSON line:
  {"metric": "i2t_train_step_512px_b4", "value": <ms>, "unit": "ms/step"}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same rig pins as bench.py: relay-side compiler + persistent compile cache
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

BATCH = 4
SIZE = 512
ITERS = 5
REPEATS = 3


def main():
    from textualdegremoval_tpu.diffusion.pipeline import (
        GuidanceModules, guidance_loss_and_grads, make_guidance_optimizer,
    )
    import optax

    # bf16 activations = the reference's fp16 mixed-precision protocol
    stage = "tr" if "--tr" in sys.argv else "i2t"
    mods = GuidanceModules.sd21_config(num_words=20, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    n_patches = 1 + (224 // 14) ** 2
    ids = jnp.ones((BATCH, 77), jnp.int32)
    batch = {
        "pixel_values": jax.random.normal(
            key, (BATCH, SIZE, SIZE, 3), jnp.float32),
        "pixel_values_clip": jax.random.normal(
            key, (BATCH, 224, 224, 3), jnp.float32),
        "input_ids": ids,
        "inj_index": jnp.full((BATCH,), 5, jnp.int32),
    }

    print("initializing towers (random weights, real sizes)...",
          file=sys.stderr)
    dummy_lat = jnp.zeros((1, SIZE // 8, SIZE // 8, 4), jnp.float32)
    params = {
        "image_encoder": jax.jit(mods.image_encoder.init)(
            key, batch["pixel_values_clip"][:1])["params"],
        "mapper": mods.mapper.init(
            key, jnp.zeros((1, n_patches, 1280)))["params"],
        "clean_mapper": mods.clean_mapper.init(
            key, jnp.zeros((1, 20, 1024)))["params"],
        "text_encoder": jax.jit(mods.text_encoder.init)(
            key, ids[:1])["params"],
        "unet": jax.jit(mods.unet.init)(
            key, dummy_lat, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 1024)))["params"],
        "vae": jax.jit(mods.vae.init)(
            key, jnp.zeros((1, SIZE, SIZE, 3)), key)["params"],
    }

    # frozen towers held in bf16 (the reference's fp16 mixed-precision
    # protocol — the modules cast to bf16 at use anyway, so storing f32
    # only burns HBM: 1.9B params f32 + activations exceed the 16 GB chip)
    from textualdegremoval_tpu.diffusion.pipeline import trainable_mask
    mask = trainable_mask(params, stage)
    params = jax.tree_util.tree_map(
        lambda p, m: p if m else p.astype(jnp.bfloat16), params, mask)

    tx = make_guidance_optimizer(params, stage, lr=1e-6)
    opt_state = tx.init(params)

    def one_step(p, o, batch, rng):
        # same semantics as make_guidance_train_step (partitioned grads:
        # frozen towers are constants; UNet remat — see diffusion_loss),
        # unjitted so the chain fori_loop can carry it
        loss, grads = guidance_loss_and_grads(mods, p, batch, rng, stage,
                                              remat=True)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    # params/opt_state/batch as jit ARGUMENTS, not closures: the relay
    # serializes closed-over device arrays into the compile request body,
    # which can blow its size limit (HTTP 413)
    def chain(params, opt_state, batch, rng):
        def body(i, carry):
            (p, o), _ = carry
            return one_step(p, o, batch, jax.random.fold_in(rng, i))
        out = jax.lax.fori_loop(
            0, ITERS, body, ((params, opt_state), jnp.zeros((), jnp.float32)))
        return out[1]

    fn = jax.jit(chain)
    tiny = jax.jit(lambda x: jnp.sum(x * 2.0))
    float(tiny(batch["pixel_values"]))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(batch["pixel_values"]))
    overhead = (time.perf_counter() - t0) / 5

    rng = jax.random.PRNGKey(1)
    print("compiling the chained train step...", file=sys.stderr)
    float(fn(params, opt_state, batch, rng))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(params, opt_state, batch, rng))
        times.append((time.perf_counter() - t0 - overhead) / ITERS)
    mean = sum(times) / len(times)
    print(f"{stage} train step: {mean * 1e3:.1f} ms (batch {BATCH} @ {SIZE}px, "
          f"chained x{ITERS}, {REPEATS} repeats)", file=sys.stderr)
    print(json.dumps({
        "metric": f"{stage}_train_step_{SIZE}px_b{BATCH}",
        "value": round(mean * 1e3, 1),
        "unit": "ms/step",
    }))


if __name__ == "__main__":
    main()
