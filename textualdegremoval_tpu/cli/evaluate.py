"""Evaluation CLI: per-task constructor table + PSNR/SSIM loop.

Command surface mirrors the reference eval scripts
(scripts/eval/main_evaluation_color_denoise15.py and
main_evaluation_deblur_derain_dehaze.py):

    python -m textualdegremoval_tpu.cli.evaluate \
        --task restormer_color_denoise --sigma 15 \
        --hqroot ... --refroot ... [--lqroot ...] \
        --checkpoint_path net_g.pth

Denoise tasks synthesize noise with the deterministic protocol
(np.random.seed(0), sigma/255 on HQ — reference :92-96); paired tasks read
lq from --lqroot.  PSNR/SSIM with crop_border=0.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from textualdegremoval_tpu.models import define_network
from textualdegremoval_tpu.metrics import calculate_psnr, calculate_ssim
from textualdegremoval_tpu.convert import load_torch_checkpoint
from textualdegremoval_tpu.data.pairing import scan_images
from textualdegremoval_tpu.data.datasets import imread_f32

# per-task network constructor table (reference
# main_evaluation_deblur_derain_dehaze.py:26-264 hparams)
TASK_TABLE = {
    # tiny config for CI smoke runs
    "tiny_smoke": {
        "type": "RestormerRefFusion", "dim": 8, "num_blocks": [1, 1, 1, 1],
        "num_refinement_blocks": 1, "heads": [1, 1, 2, 2], "bias": False,
        "LayerNorm_type": "WithBias", "nf": 8, "ext_n_blocks": [1, 1, 1, 1],
        "reffusion_n_blocks": [1, 1, 1, 1], "lr_block_size": 4,
    },
    "restormer_color_denoise": {
        "type": "RestormerRefFusion", "dim": 48, "num_blocks": [4, 6, 6, 8],
        "num_refinement_blocks": 4, "heads": [1, 2, 4, 8],
        "ffn_expansion_factor": 2.66, "bias": False,
        "LayerNorm_type": "BiasFree", "nf": 48,
        "ext_n_blocks": [4, 4, 4, 4], "reffusion_n_blocks": [2, 2, 2, 2],
        "lr_block_size": 8,
    },
    "restormer_gray_denoise": {
        "type": "RestormerRefFusion", "inp_channels": 1, "out_channels": 1,
        "dim": 48, "num_blocks": [4, 6, 6, 8], "num_refinement_blocks": 4,
        "heads": [1, 2, 4, 8], "ffn_expansion_factor": 2.66, "bias": False,
        "LayerNorm_type": "BiasFree", "nf": 48,
        "ext_n_blocks": [4, 4, 4, 4], "reffusion_n_blocks": [2, 2, 2, 2],
        "lr_block_size": 8,
    },
    "restormer_deblur": {
        "type": "RestormerRefFusion", "dim": 48, "num_blocks": [4, 6, 6, 8],
        "num_refinement_blocks": 4, "heads": [1, 2, 4, 8],
        "ffn_expansion_factor": 2.66, "bias": False,
        "LayerNorm_type": "WithBias", "nf": 48,
        "ext_n_blocks": [4, 4, 4, 4], "reffusion_n_blocks": [2, 2, 2, 2],
        "lr_block_size": 8,
    },
    "nafnet_deblur": {
        "type": "NAFNetRefFusion", "width": 64, "middle_blk_num": 1,
        "enc_blk_nums": [1, 1, 1, 28], "dec_blk_nums": [1, 1, 1, 1],
        "nf": 64, "ext_n_blocks": [4, 4, 4, 4],
        "reffusion_n_blocks": [2, 2, 2, 2], "lr_block_size": 8,
    },
    "drsformer_derain": {
        "type": "DRSformerRefFusion", "dim": 48, "num_blocks": [4, 6, 6, 8],
        "heads": [1, 2, 4, 8], "nf": 48, "ext_n_blocks": [4, 4, 4, 4],
        "reffusion_n_blocks": [2, 2, 2, 2], "lr_block_size": 8,
        "use_mefc": True,
    },
    "drsformer_derain_200l_spa": {
        "type": "DRSformer200L_SPA_RefFusion", "dim": 48,
        "num_blocks": [4, 6, 6, 8], "heads": [1, 2, 4, 8], "nf": 48,
        "ext_n_blocks": [4, 4, 4, 4], "reffusion_n_blocks": [2, 2, 2, 2],
        "lr_block_size": 8, "use_mefc": False,
    },
    "sfnet_dehaze_indoor": {
        "type": "SFNetRefFusion", "num_res": 16, "nf": 32,
        "ext_n_blocks": [4, 4, 4], "reffusion_n_blocks": [1, 1, 1],
        "lr_block_size": 8, "tlc_base": 246,
    },
    "sfnet_dehaze_outdoor": {
        "type": "SFNetRefFusion", "num_res": 16, "nf": 32,
        "ext_n_blocks": [4, 4, 4], "reffusion_n_blocks": [1, 1, 1],
        "lr_block_size": 8, "tlc_base": 210,
    },
    "promptir_all_in_one": {
        "type": "PromptIRRefFusion", "dim": 48, "num_blocks": [4, 6, 6, 8],
        "num_refinement_blocks": 4, "heads": [1, 2, 4, 8], "decoder": True,
        "nf": 48, "ext_n_blocks": [4, 4, 4, 4],
        "reffusion_n_blocks": [2, 2, 2, 2], "lr_block_size": 8,
    },
    # dual-pixel defocus deblur: 6-channel lqL+lqR 16-bit input (reference
    # Restormer dual_pixel_task + Dataset_PairedImageWithRef_DualPixel_16bit)
    "restormer_dual_pixel_defocus": {
        "type": "RestormerRefFusion", "inp_channels": 6, "out_channels": 3,
        "dim": 48, "num_blocks": [4, 6, 6, 8], "num_refinement_blocks": 4,
        "heads": [1, 2, 4, 8], "ffn_expansion_factor": 2.66, "bias": False,
        "LayerNorm_type": "WithBias", "dual_pixel_task": True, "nf": 48,
        "ext_n_blocks": [4, 4, 4, 4], "reffusion_n_blocks": [2, 2, 2, 2],
        "lr_block_size": 8,
    },
}

# keys rewritten by --tiny_debug: same constructor/code path (gray channels,
# TLC bases, MEFC flags, dual-pixel skip, batch_stats) at toy widths so every
# task's wiring runs in CI
_SHRINK_SCALARS = {"dim": 8, "nf": 8, "width": 8, "num_res": 1,
                   "middle_blk_num": 1, "num_refinement_blocks": 1,
                   "lr_block_size": 4}
_SHRINK_LISTS = ("num_blocks", "enc_blk_nums", "dec_blk_nums",
                 "ext_n_blocks", "reffusion_n_blocks")


def shrink_for_smoke(opt: dict) -> dict:
    o = dict(opt)
    for k, v in _SHRINK_SCALARS.items():
        if k in o:
            o[k] = v
    for k in _SHRINK_LISTS:
        if k in o:
            o[k] = [1] * len(o[k])
    if "heads" in o:
        o["heads"] = [1, 1, 2, 2][: len(o["heads"])]
    if o["type"] == "SFNetRefFusion":
        o["base_channel"] = 8
    return o


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=sorted(TASK_TABLE))
    ap.add_argument("--hqroot", required=True)
    ap.add_argument("--refroot", required=True)
    ap.add_argument("--lqroot", default=None)
    ap.add_argument("--lqlroot", default=None,
                    help="dual-pixel tasks: left-view 16-bit inputs")
    ap.add_argument("--lqrroot", default=None,
                    help="dual-pixel tasks: right-view 16-bit inputs")
    ap.add_argument("--checkpoint_path", default=None)
    ap.add_argument("--sigma", type=float, default=15)
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--tiny_debug", action="store_true",
                    help="shrink the task's network to toy widths "
                         "(CI smoke: same constructor path, tiny compile)")
    ap.add_argument("--spatial_shard", type=int, default=0,
                    help="shard the image H axis over N devices (GSPMD "
                         "halo-exchange convs; for >2K whole-image eval "
                         "that exceeds one chip's HBM; 0 = off)")
    args = ap.parse_args(argv)

    opt = dict(TASK_TABLE[args.task])
    if args.tiny_debug:
        opt = shrink_for_smoke(opt)
    model = define_network(opt, dtype=getattr(jnp, args.dtype))

    hq_paths = scan_images(args.hqroot)
    ref_paths = scan_images(args.refroot)
    lq_paths = scan_images(args.lqroot) if args.lqroot else [None] * len(hq_paths)
    if args.max_images:
        hq_paths = hq_paths[: args.max_images]

    variables = None
    # variables is the full collection tree: SFNet carries batch_stats
    # alongside params (frozen running statistics at eval)
    fwd = jax.jit(lambda v, lq, ref: _last(model.apply(v, lq, ref)))

    # sp sharding: images sharded on H across devices, params replicated;
    # GSPMD inserts the conv halo exchanges (dryrun-validated dp x sp path,
    # tests/test_spatial_sharding.py).  The image is reflect-padded to a
    # multiple of the shard count and cropped back after the forward.
    mesh = img_sh = rep_sh = None
    if args.spatial_shard > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n_sp = args.spatial_shard
        if len(jax.devices()) < n_sp:
            raise SystemExit(
                f"--spatial_shard {n_sp} needs {n_sp} devices, have "
                f"{len(jax.devices())}")
        mesh = Mesh(
            np.asarray(jax.devices()[:n_sp]).reshape(1, n_sp), ("dp", "sp"))
        img_sh = NamedSharding(mesh, P(None, "sp"))
        rep_sh = NamedSharding(mesh, P())

    psnrs, ssims = [], []
    gray = opt.get("inp_channels", 3) == 1
    dual_pixel = bool(opt.get("dual_pixel_task"))
    lql_paths = scan_images(args.lqlroot) if args.lqlroot else None
    lqr_paths = scan_images(args.lqrroot) if args.lqrroot else None
    for i, hq_path in enumerate(hq_paths):
        hq = imread_f32(hq_path, bit16=dual_pixel)
        ref = imread_f32(ref_paths[min(i, len(ref_paths) - 1)])
        if gray:
            import cv2
            hq = cv2.cvtColor(hq, cv2.COLOR_RGB2GRAY)[..., None]
            ref = cv2.cvtColor(ref, cv2.COLOR_RGB2GRAY)[..., None]
        if dual_pixel:
            # 6-channel lqL+lqR 16-bit pair (reference DP dataset semantics)
            lq = np.concatenate([imread_f32(lql_paths[i], bit16=True),
                                 imread_f32(lqr_paths[i], bit16=True)],
                                axis=-1)
        elif lq_paths[i] is None:
            rng = np.random.RandomState(0)  # deterministic eval protocol
            lq = hq + rng.randn(*hq.shape).astype(np.float32) * args.sigma / 255.0
        else:
            lq = imread_f32(lq_paths[i])

        orig_h = lq.shape[0]
        if mesh is not None:
            pad_h = (-orig_h) % args.spatial_shard
            if pad_h:
                lq = np.pad(lq, ((0, pad_h), (0, 0), (0, 0)), "reflect")
        lq_j = jnp.asarray(lq)[None]
        ref_j = jnp.asarray(ref)[None]
        if mesh is not None:
            # ref is replicated (it may differ in size from lq and its
            # encoder pass is cheap); lq and everything downstream of it
            # shard on H
            lq_j = jax.device_put(lq_j, img_sh)
            ref_j = jax.device_put(ref_j, rep_sh)
        if variables is None:
            if args.checkpoint_path and os.path.exists(args.checkpoint_path):
                from textualdegremoval_tpu.convert.torch_to_jax import (
                    split_batch_stats)

                variables = split_batch_stats(
                    load_torch_checkpoint(args.checkpoint_path))
            else:
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(0), lq_j, ref_j)
            if mesh is not None:
                variables = jax.device_put(variables, rep_sh)
        pred = np.clip(np.asarray(fwd(variables, lq_j, ref_j))[0], 0, 1)
        pred = pred[:orig_h]
        psnrs.append(calculate_psnr(pred * 255, hq * 255, crop_border=0))
        ssims.append(calculate_ssim(pred * 255, hq * 255, crop_border=0))
        print(f"[{i + 1}/{len(hq_paths)}] psnr {psnrs[-1]:.4f} "
              f"ssim {ssims[-1]:.4f}")

    print(f"mean PSNR: {np.mean(psnrs):.4f}  mean SSIM: {np.mean(ssims):.4f}")
    return float(np.mean(psnrs)), float(np.mean(ssims))


def _last(out):
    return out[-1] if isinstance(out, (list, tuple)) else out


if __name__ == "__main__":
    main()
