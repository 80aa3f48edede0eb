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
import cv2

from textualdegremoval_tpu.diffusion.pipeline import (
    GuidanceModules, make_guidance_optimizer, make_guidance_train_step,
)
from textualdegremoval_tpu.data.pairing import scan_images
from textualdegremoval_tpu.data.datasets import imread_f32
from textualdegremoval_tpu.cli.generate_reference import (
    tokenize, PROMPT_TEMPLATE, INJ_INDEX, CLIP_MEAN, CLIP_STD,
)
from textualdegremoval_tpu.utils.logger import get_root_logger


def make_batch(paths, indices, size, input_ids, hq_paths=None):
    """UnpairedLQHQDataset equivalent: random 512 crop -> SD view in [-1,1]
    + CLIP-normalized 224 view (data/guidance_generation_dataset.py:86-265).
    With hq_paths (TR stage, PairedLQHQDataset :269-552): the CLIP view is
    the *degraded* crop, the SD target the aligned *clean* crop."""
    sd_views, clip_views = [], []
    rng = np.random.default_rng()
    for i in indices:
        img = imread_f32(paths[i % len(paths)])
        hq = imread_f32(hq_paths[i % len(hq_paths)]) if hq_paths else img
        h, w = img.shape[:2]
        if min(h, w) < size:
            img = cv2.resize(img, (max(size, w), max(size, h)))
            hq = cv2.resize(hq, (max(size, w), max(size, h)))
            h, w = img.shape[:2]
        top = rng.integers(0, h - size + 1)
        left = rng.integers(0, w - size + 1)
        crop = img[top : top + size, left : left + size]
        hq_crop = hq[top : top + size, left : left + size]
        sd_views.append(hq_crop * 2.0 - 1.0)
        cv = cv2.resize(crop, (224, 224))
        clip_views.append((cv - CLIP_MEAN) / CLIP_STD)
    b = len(indices)
    return {
        "pixel_values": jnp.asarray(np.stack(sd_views)),
        "pixel_values_clip": jnp.asarray(np.stack(clip_views)),
        "input_ids": jnp.tile(jnp.asarray(input_ids), (b, 1)),
        "inj_index": jnp.full((b,), INJ_INDEX, jnp.int32),
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
    ap.add_argument("--validation_samples", action="store_true",
                    help="at each save, DDIM-sample a reference from the "
                         "first batch image and save input|sample JPGs "
                         "(reference save_steps side-by-side grids)")
    ap.add_argument("--validation_steps", type=int, default=100)
    args = ap.parse_args(argv)

    logger = get_root_logger()
    mods = GuidanceModules.sd21_config(num_words=args.num_words)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.abspath(args.pretrained_params))

    lr = args.learning_rate
    if args.scale_lr:
        # reference scale_lr (main_train_i2t_mapping.py:623-626)
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size \
            * jax.process_count()
    tx = make_guidance_optimizer(params, stage, lr=lr)
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    step_fn = make_guidance_train_step(mods, tx, stage)
    opt_state = tx.init(params)

    paths = scan_images(args.train_data_dir)
    hq_paths = scan_images(args.train_data_dir_hq) \
        if args.train_data_dir_hq else None
    input_ids = tokenize(PROMPT_TEMPLATE)
    rng = jax.random.PRNGKey(args.seed)
    idx_rng = np.random.default_rng(args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    for step in range(args.max_train_steps):
        indices = idx_rng.integers(0, len(paths), args.train_batch_size)
        batch = make_batch(paths, indices, args.resolution, input_ids,
                           hq_paths)
        rng, srng = jax.random.split(rng)
        params, opt_state, loss = step_fn(params, opt_state, batch, srng)
        if step % 100 == 0:
            logger.info(f"[{stage}] step {step} loss {float(loss):.5f}")
        if (step + 1) % args.save_steps == 0 and jax.process_index() == 0:
            ckptr.save(os.path.join(os.path.abspath(args.output_dir),
                                    f"{stage}_params_{step + 1}"),
                       jax.device_get(params), force=True)
            if args.validation_samples:
                _save_sample_grid(mods, params, batch, args, stage, step + 1,
                                  srng)
    return params


def _save_sample_grid(mods, params, batch, args, stage, step, rng):
    """Side-by-side (input | generated reference) JPG at save time
    (reference main_train_i2t_mapping.py:763-774 sample grids)."""
    from textualdegremoval_tpu.diffusion.pipeline import generate_reference
    from textualdegremoval_tpu.utils.image import tensor2img, imwrite

    uncond_ids = tokenize("")
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
