"""I2T mapper training CLI (pipeline A, stage 1).

Command surface mirrors scripts/train/main_train_i2t_mapping.py (README
:57-72): frozen CLIP/SD towers, trainable I2T mapper + UNet global k/v,
eps-MSE loss, grad accumulation via optax.MultiSteps, scaled LR.

    python -m textualdegremoval_tpu.cli.train_i2t \
        --train_data_dir ... --pretrained_params <orbax towers> \
        --output_dir ... [--num_words 20 --lr 1e-6 --scale_lr ...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from textualdegremoval_tpu.diffusion.pipeline import (
    GuidanceModules, make_guidance_optimizer, make_guidance_train_step,
)
from textualdegremoval_tpu.diffusion.tokenizer import tokenize_template
from textualdegremoval_tpu.data.guidance import (
    UnpairedLQHQDataset, PairedLQHQDataset,
)
from textualdegremoval_tpu.data import DataLoader
from textualdegremoval_tpu.data.sampler import EnlargedSampler
from textualdegremoval_tpu.cli.generate_reference import PROMPT_TEMPLATE
from textualdegremoval_tpu.utils.logger import get_root_logger


def _device_batch(batch, input_ids):
    """Collated host batch (data.guidance datasets through the DataLoader)
    -> jnp arrays for the train step."""
    b = batch["pixel_values"].shape[0]
    return {
        "pixel_values": jnp.asarray(batch["pixel_values"]),
        "pixel_values_clip": jnp.asarray(batch["pixel_values_clip"]),
        "input_ids": jnp.tile(jnp.asarray(input_ids), (b, 1)),
        "inj_index": jnp.asarray(batch["index"], jnp.int32),
    }


def run(stage: str, argv=None):
    # multi-host rendezvous (the reference's accelerate launcher analogue);
    # no-op when single-process
    from textualdegremoval_tpu.parallel.bootstrap import init_distributed
    init_distributed()

    ap = argparse.ArgumentParser()
    ap.add_argument("--train_data_dir", required=True)
    ap.add_argument("--train_data_dir_hq", default=None,
                    help="TR stage: clean targets paired with degraded "
                         "--train_data_dir inputs")
    ap.add_argument("--pretrained_params", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_words", type=int, default=20)
    ap.add_argument("--learning_rate", type=float, default=1e-6)
    ap.add_argument("--scale_lr", action="store_true")
    ap.add_argument("--train_batch_size", type=int, default=4)
    ap.add_argument("--gradient_accumulation_steps", type=int, default=4)
    ap.add_argument("--max_train_steps", type=int, default=200000)
    ap.add_argument("--save_steps", type=int, default=5000)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--tokenizer_path", default=None,
                    help="SD checkpoint tokenizer/ dir; omitted -> "
                         "known-id fallback for the default template")
    ap.add_argument("--template", default=PROMPT_TEMPLATE)
    ap.add_argument("--placeholder_token", default="S")
    ap.add_argument("--sigma_range", type=float, nargs=2, default=(5, 50),
                    help="TR denoise-synthesis sigma range (no HQ dir)")
    ap.add_argument("--mixed_precision", default="no",
                    choices=["no", "bf16"],
                    help="bf16: tower activations in bf16 and frozen-tower "
                         "weights stored bf16 (the reference's accelerate "
                         "fp16 protocol, main_train_i2t_mapping.py:373-383)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the UNet forward (fits the "
                         "reference's batch 4 @ 512px on one 16 GB chip)")
    ap.add_argument("--tiny_debug_towers", action="store_true",
                    help="use GuidanceModules.small_test_config — "
                         "infrastructure smoke only (tiny vocab: real "
                         "token ids are folded into range)")
    ap.add_argument("--validation_samples", action="store_true",
                    help="at each save, DDIM-sample a reference from the "
                         "first batch image and save input|sample JPGs "
                         "(reference save_steps side-by-side grids)")
    ap.add_argument("--validation_steps", type=int, default=100)
    args = ap.parse_args(argv)

    logger = get_root_logger()
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32
    mods = (GuidanceModules.small_test_config(num_words=args.num_words)
            if args.tiny_debug_towers
            else GuidanceModules.sd21_config(num_words=args.num_words,
                                             dtype=dtype))

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.abspath(args.pretrained_params))
    if args.mixed_precision == "bf16":
        # frozen towers stored bf16 (they are cast to bf16 at use anyway;
        # trainables keep f32 masters)
        from textualdegremoval_tpu.diffusion.pipeline import trainable_mask
        mask = trainable_mask(params, stage)
        params = jax.tree_util.tree_map(
            lambda p, m: p if m else p.astype(jnp.bfloat16), params, mask)

    lr = args.learning_rate
    if args.scale_lr:
        # reference scale_lr (main_train_i2t_mapping.py:623-626)
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size \
            * jax.process_count()
    tx = make_guidance_optimizer(params, stage, lr=lr)
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    step_fn = make_guidance_train_step(mods, tx, stage, remat=args.remat)
    opt_state = tx.init(params)

    # data: the tested guidance dataset classes through the DataLoader
    # (reference UnpairedLQHQDataset / PairedLQHQDataset semantics:
    # aspect-preserving min-side resize before the random square crop,
    # seeded; guidance_generation_dataset.py:86-552)
    input_ids, _, inj_index = tokenize_template(
        args.template, args.placeholder_token,
        tokenizer_path=args.tokenizer_path)
    clip_size = 224
    if args.tiny_debug_towers:
        vocab = mods.text_encoder.vocab_size
        pos = mods.text_encoder.max_positions
        input_ids = (input_ids[:, :pos] % vocab).astype(np.int32)
        clip_size = mods.image_encoder.image_size
    seed = args.seed + jax.process_index()
    if stage == "tr":
        if args.train_data_dir_hq:
            task_roots = {"paired": (args.train_data_dir,
                                     args.train_data_dir_hq)}
        else:  # denoise synthesis from clean images
            task_roots = {"denoise": (None, args.train_data_dir)}
        dataset = PairedLQHQDataset(
            task_roots, size=args.resolution, placeholder_index=inj_index,
            sigma_range=tuple(args.sigma_range), seed=seed,
            clip_size=clip_size)
    else:
        dataset = UnpairedLQHQDataset(
            args.train_data_dir, size=args.resolution,
            placeholder_index=inj_index, seed=seed, clip_size=clip_size)

    sampler = EnlargedSampler(
        len(dataset), num_replicas=jax.process_count(),
        rank=jax.process_index(),
        ratio=max(1, -(-args.train_batch_size * jax.process_count()
                       // max(len(dataset), 1))))
    loader = DataLoader(dataset, args.train_batch_size, sampler=sampler,
                        num_workers=args.num_workers, drop_last=True)

    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    step = 0
    epoch = 0
    while step < args.max_train_steps:
        sampler.set_epoch(epoch)
        for host_batch in loader:
            if step >= args.max_train_steps:
                break
            batch = _device_batch(host_batch, input_ids)
            rng, srng = jax.random.split(rng)
            params, opt_state, loss = step_fn(params, opt_state, batch, srng)
            if step % 100 == 0:
                logger.info(f"[{stage}] step {step} loss {float(loss):.5f}")
            step += 1
            # Orbax saves are collective — every process must call (the
            # primary host does the writing); rank-0 gating deadlocks
            if step % args.save_steps == 0:
                ckptr.save(os.path.join(os.path.abspath(args.output_dir),
                                        f"{stage}_params_{step}"),
                           jax.device_get(params), force=True)
                # async save: block before continuing (a process exit with
                # the write still in flight loses the checkpoint)
                ckptr.wait_until_finished()
                if args.validation_samples and jax.process_index() == 0:
                    _save_sample_grid(mods, params, batch, args, stage,
                                      step, srng)
        epoch += 1
    return params


def _save_sample_grid(mods, params, batch, args, stage, step, rng):
    """Side-by-side (input | generated reference) JPG at save time
    (reference main_train_i2t_mapping.py:763-774 sample grids)."""
    from textualdegremoval_tpu.diffusion.pipeline import generate_reference
    from textualdegremoval_tpu.utils.image import tensor2img, imwrite

    uncond_ids = tokenize_template(
        args.template, args.placeholder_token,
        tokenizer_path=args.tokenizer_path)[1]
    img = generate_reference(
        mods, params, batch["pixel_values_clip"][:1],
        batch["input_ids"][:1], jnp.asarray(uncond_ids),
        batch["inj_index"][:1], rng,
        latent_hw=(args.resolution // 8, args.resolution // 8),
        num_inference_steps=args.validation_steps,
        use_clean_mapper=(stage == "tr"))
    inp = tensor2img((np.asarray(batch["pixel_values"][:1]) + 1) / 2)
    gen = tensor2img((np.asarray(img) + 1) / 2)
    if gen.shape[0] != inp.shape[0]:
        import cv2

        gen = cv2.resize(gen, (inp.shape[1], inp.shape[0]))
    imwrite(np.concatenate([inp, gen], axis=1),
            os.path.join(args.output_dir, f"{stage}_sample_{step:06d}.jpg"))


def main(argv=None):
    return run("i2t", argv)


if __name__ == "__main__":
    main()
