"""Reference-image generation CLI (pipeline A inference).

Command surface mirrors scripts/generate/main_generate_reference.py:

    python -m textualdegremoval_tpu.cli.generate_reference \
        --test_data_dir <degraded images> --output_dir <out> \
        --i2t_mapper_path ... --tr_mapper_path ... \
        [--pretrained_params <orbax dir with tower params>] \
        [--num_words 20 --guidance_scale 5 --steps 100 --size 512]

The reference's fp16 towers map to bfloat16 here.  For each input image:
center-crop -> 512 SD view + 224 CLIP view -> I2T -> TR clean mapper ->
inject -> 100-step DDIM CFG -> decode -> save PNG (reference
ReferenceGenerationDataset + validation loop, SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import cv2

from textualdegremoval_tpu.diffusion.pipeline import (
    GuidanceModules, generate_reference,
)
from textualdegremoval_tpu.data.pairing import scan_images
from textualdegremoval_tpu.data.datasets import imread_f32
from textualdegremoval_tpu.utils.image import tensor2img, imwrite

from textualdegremoval_tpu.diffusion.tokenizer import tokenize_template

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

PROMPT_TEMPLATE = "a photo of a S"
# derived by the reference's placeholder rule; with --tokenizer_path (the SD
# checkpoint's tokenizer/ dir) real BPE ids replace the known-id fallback
INJ_INDEX = tokenize_template(PROMPT_TEMPLATE)[2]


def center_crop_square(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    return img[top : top + s, left : left + s]


def tokenize(prompt: str, max_length: int = 77, tokenizer_path=None):
    """Back-compat helper (train_i2t imports it): full-prompt ids only."""
    if prompt == "":
        return tokenize_template(PROMPT_TEMPLATE, max_length=max_length,
                                 tokenizer_path=tokenizer_path)[1]
    return tokenize_template(prompt, max_length=max_length,
                             tokenizer_path=tokenizer_path)[0]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--test_data_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--pretrained_params", default=None,
                    help="orbax dir with {text_encoder,image_encoder,unet,"
                         "vae,mapper,clean_mapper} params")
    ap.add_argument("--tokenizer_path", default=None,
                    help="SD checkpoint tokenizer/ dir (vocab.json + "
                         "merges.txt); omitted -> documented known-id "
                         "fallback for the default template")
    ap.add_argument("--template", default=PROMPT_TEMPLATE)
    ap.add_argument("--placeholder_token", default="S")
    ap.add_argument("--num_words", type=int, default=20)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--random_init", action="store_true",
                    help="seed-0 random tower weights — exercises the full "
                         "pipeline without converted checkpoints (outputs "
                         "are noise; infrastructure smoke only)")
    args = ap.parse_args(argv)

    mods = GuidanceModules.sd21_config(num_words=args.num_words)
    os.makedirs(args.output_dir, exist_ok=True)

    ids, uids, inj = tokenize_template(
        args.template, args.placeholder_token,
        tokenizer_path=args.tokenizer_path)
    input_ids = jnp.asarray(ids)
    uncond_ids = jnp.asarray(uids)
    inj_index = jnp.asarray([inj], jnp.int32)

    if args.pretrained_params:
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.pretrained_params))
    elif args.random_init:
        key = jax.random.PRNGKey(0)
        dummy_clip = jnp.zeros((1, 224, 224, 3), jnp.float32)
        dummy_lat = jnp.zeros((1, args.size // 8, args.size // 8, 4),
                              jnp.float32)
        dummy_img = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
        image_params = jax.jit(mods.image_encoder.init)(key, dummy_clip)
        n_patches = 1 + (224 // 14) ** 2
        params = {
            "image_encoder": image_params["params"],
            "mapper": mods.mapper.init(
                key, jnp.zeros((1, n_patches, 1280)))["params"],
            "clean_mapper": mods.clean_mapper.init(
                key, jnp.zeros((1, args.num_words, 1024)))["params"],
            "text_encoder": jax.jit(mods.text_encoder.init)(
                key, input_ids)["params"],
            "unet": jax.jit(mods.unet.init)(
                key, dummy_lat, jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, 1024)))["params"],
            "vae": jax.jit(mods.vae.init)(key, dummy_img, key)["params"],
        }
    else:
        raise SystemExit(
            "--pretrained_params is required (tower weights); convert the "
            "reference checkpoints with textualdegremoval_tpu.convert "
            "first, or pass --random_init for an infrastructure smoke run")

    paths = scan_images(args.test_data_dir)
    rng = jax.random.PRNGKey(args.seed)
    for i, path in enumerate(paths):
        img = center_crop_square(imread_f32(path))
        sd_view = cv2.resize(img, (args.size, args.size))
        clip_view = cv2.resize(img, (224, 224))
        clip_view = (clip_view - CLIP_MEAN) / CLIP_STD

        rng, step_rng = jax.random.split(rng)
        out = generate_reference(
            mods, params, jnp.asarray(clip_view)[None], input_ids,
            uncond_ids, inj_index, step_rng,
            latent_hw=(args.size // 8, args.size // 8),
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale)
        # [-1,1] -> [0,1]
        out_img = tensor2img((np.asarray(out) + 1) / 2)
        name = os.path.splitext(os.path.basename(path))[0] + ".png"
        imwrite(out_img, os.path.join(args.output_dir, name))
        print(f"[{i + 1}/{len(paths)}] {name}")


if __name__ == "__main__":
    main()
