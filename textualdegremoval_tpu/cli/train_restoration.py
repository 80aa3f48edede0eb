"""Guided-restoration training CLI.

Command surface mirrors the reference
(scripts/train/main_train_restoration_with_ref_input.py, README.md:116):

    python -m textualdegremoval_tpu.cli.train_restoration --opt <yaml>

but launches one process per host (jax.distributed), not one per chip —
devices on a host are driven by the dp mesh.

Loop structure (reference :225-303): progressive (gt_size, batch) schedule
as *bucketed jit shapes* — the step function specializes per bucket, the
finite bucket set comes from the YAML `iters`/`gt_sizes`/`mini_batch_sizes`.
Ref-crop selection (DINO matcher) runs as a separate jitted no-grad fn
before each step, exactly like the reference's torch.no_grad block
(image_restoration_ref_model.py:219-247).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from textualdegremoval_tpu.utils.options import parse
from textualdegremoval_tpu.utils.logger import (
    get_root_logger, MessageLogger, ScalarWriter,
)
from textualdegremoval_tpu.models import define_network
from textualdegremoval_tpu.models.dino import vit_base, select_ref_crop
from textualdegremoval_tpu.data import (
    create_dataset, create_dataloader, DevicePrefetcher,
)
from textualdegremoval_tpu.losses import build_loss
from textualdegremoval_tpu.train.schedules import build_schedule, warmup_wrap
from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state, make_train_step, make_eval_step,
)
from textualdegremoval_tpu.train.checkpoint import CheckpointManager
from textualdegremoval_tpu.parallel import make_mesh, shard_batch, replicate
from textualdegremoval_tpu.metrics import calculate_psnr, calculate_ssim
from textualdegremoval_tpu.convert import load_torch_checkpoint
from textualdegremoval_tpu.train.mixing import mixing_augment


def progressive_buckets(ds_opt):
    """(iters, gt_size, batch) groups from the YAML progressive schedule
    (reference :240-271)."""
    iters = ds_opt.get("iters", [10 ** 9])
    gt_sizes = ds_opt.get("gt_sizes", [ds_opt.get("gt_size", 128)])
    batches = ds_opt.get("mini_batch_sizes",
                         [ds_opt.get("batch_size_per_gpu", 1)])
    groups = np.cumsum(iters)
    return groups, gt_sizes, batches


def pick_bucket(current_iter, groups, gt_sizes, batches):
    j = int(np.searchsorted(groups, current_iter, side="left"))
    j = min(j, len(gt_sizes) - 1)
    return gt_sizes[j], batches[min(j, len(batches) - 1)]


def crop_batch(batch, gt_size, mini_batch, rng):
    """Random sub-batch + random sub-crop to the bucket shape."""
    full = batch["lq"].shape[0]
    idx = rng.choice(full, size=min(mini_batch, full), replace=False)
    h, w = batch["lq"].shape[1:3]
    top = rng.integers(0, max(h - gt_size, 0) + 1)
    left = rng.integers(0, max(w - gt_size, 0) + 1)
    out = dict(batch)
    for k in ("lq", "gt"):
        out[k] = batch[k][idx, top : top + gt_size, left : left + gt_size]
    out["ref"] = batch["ref"][idx]
    return out


def resolve_network(opt, mixed_precision=None, remat=None, fused=None):
    """Construct the network with precision / remat / fused-kernel flags
    resolved as CLI override > YAML ``train:`` keys > defaults.

    YAML surface (reference config 003's train: block extended):
      train.mixed_precision: fp32|bf16   — compute dtype of the net
      train.remat: true                  — jax.checkpoint the forward AND
                                            the fused kernels' memory-lean
                                            backward (bwd_mode='remat')
      train.fused_kernels: auto|on|off   — whole-block Pallas kernels
    (`network_g.fused` / `network_g.bwd_mode` in YAML also work directly —
    define_network passes any constructor field through.)

    Returns (model, remat, dtype)."""
    topt = opt.get("train", {}) or {}
    mp = mixed_precision or topt.get("mixed_precision", "fp32")
    if remat is None:
        remat = bool(topt.get("remat", False))
    fused_cfg = fused if fused is not None else topt.get(
        "fused_kernels", "auto")
    dtype = jnp.bfloat16 if str(mp) == "bf16" else jnp.float32
    net_opt = dict(opt["network_g"])
    if isinstance(fused_cfg, bool):
        net_opt.setdefault("fused", fused_cfg)
    elif fused_cfg in ("on", "off"):
        net_opt.setdefault("fused", fused_cfg == "on")
    if remat:
        net_opt.setdefault("bwd_mode", "remat")
    return define_network(net_opt, dtype=dtype), remat, dtype


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--max_iters", type=int, default=None,
                    help="override total_iter (smoke runs)")
    ap.add_argument("--mixed_precision", choices=["fp32", "bf16"],
                    default=None, help="override train.mixed_precision")
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="rematerialized backward; --no-remat disables a "
                         "YAML train.remat: true (override train.remat)")
    ap.add_argument("--fused", choices=["auto", "on", "off"], default=None,
                    help="whole-block Pallas kernels "
                         "(override train.fused_kernels)")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    # multi-host rendezvous (env/slurm), before any backend use; no-op for
    # single-process launches (the reference's init_dist call site,
    # main_train_restoration_with_ref_input.py:23-57)
    from textualdegremoval_tpu.parallel.bootstrap import init_distributed
    init_distributed()

    opt = parse(args.opt, is_train=True)
    logger = get_root_logger(
        log_file=os.path.join(opt["path"]["log"], "train.log"))

    # YAML batch sizes are per-device (reference batch_size_per_gpu); the dp
    # mesh is sized so the global batch divides evenly.
    ds_opt = dict(opt["datasets"]["train"])
    per_dev_batch = ds_opt.get("batch_size_per_gpu", 1)
    n_dev = jax.local_device_count()
    mesh = make_mesh(dp=n_dev)
    global_batch = per_dev_batch * n_dev
    ds_opt["batch_size_per_gpu"] = global_batch
    logger.info(f"mesh: {mesh.devices.shape} devices, "
                f"global batch {global_batch}")

    # data
    train_set = create_dataset(ds_opt)
    train_loader = create_dataloader(
        train_set, ds_opt, num_replicas=jax.process_count(),
        rank=jax.process_index())
    val_loader = None
    if "val" in opt.get("datasets", {}):
        val_opt = opt["datasets"]["val"]
        try:
            val_set = create_dataset(val_opt)
            val_loader = create_dataloader(val_set, val_opt)
        except Exception as e:  # val data optional in smoke runs
            logger.warning(f"no val data: {e}")

    # model (precision / remat / fused kernels per resolve_network)
    model, remat, net_dtype = resolve_network(
        opt, mixed_precision=args.mixed_precision, remat=args.remat,
        fused=args.fused)
    logger.info(f"network dtype={net_dtype.__name__} remat={remat} "
                f"fused={getattr(model, 'fused', None)}")
    key = jax.random.PRNGKey(opt.get("manual_seed", 0))
    gt_size = ds_opt.get("gt_size", 128)
    dummy = jnp.zeros((1, gt_size, gt_size,
                       opt["network_g"].get("inp_channels",
                                            opt["network_g"].get(
                                                "img_channel", 3))))
    params = jax.jit(model.init)(key, dummy, dummy)["params"]

    # EMA semantics (reference base_model.py:108-126: train.ema_decay,
    # default 0 = off; validation/saving use the EMA net when on)
    ema_decay = float(opt["train"].get("ema_decay", 0) or 0)

    ema_params = None
    load_path = opt["path"].get("pretrain_network_g")
    if load_path and os.path.exists(str(load_path)):
        params = load_torch_checkpoint(load_path)
        logger.info(f"loaded pretrained params from {load_path}")
        if ema_decay > 0:
            # reference :121-125 — load params_ema into the EMA net when
            # present, else fall back to a weight copy (model_ema(0))
            try:
                ema_params = load_torch_checkpoint(
                    load_path, key="params_ema", strict_key=True)
                logger.info("loaded params_ema into EMA state")
            except KeyError:
                logger.info("params_ema not in checkpoint, using params copy")

    # DINO matcher (optional — identity center-crop fallback without weights)
    dino_path = opt["path"].get("pretrain_dino")
    matcher = None
    if dino_path and os.path.exists(str(dino_path)):
        dino = vit_base()
        dino_params = load_torch_checkpoint(dino_path, key=None)
        matcher = jax.jit(
            lambda lq, ref: select_ref_crop(
                dino.apply, {"params": dino_params}, lq, ref))
        logger.info("DINO matcher loaded")

    # optimizer / schedules
    topt = opt["train"]
    lr = topt["optim_g"]["lr"]
    ref_lr = topt["optim_g"].get("ref_lr", lr)
    sched = warmup_wrap(build_schedule(lr, topt["scheduler"]),
                        topt.get("warmup_iter", -1), lr)
    ref_sched = warmup_wrap(build_schedule(ref_lr, topt["scheduler"]),
                            topt.get("warmup_iter", -1), ref_lr)
    tx = build_optimizer(
        params, sched, ref_sched,
        weight_decay=topt["optim_g"].get("weight_decay", 1e-4),
        betas=tuple(topt["optim_g"].get("betas", (0.9, 0.999))),
        grad_clip=0.01 if topt.get("use_grad_clip", True) else None,
        param_fix_iterations=topt.get("param_fix_iterations", 0),
    )
    state = create_train_state(params, tx, ema_params=ema_params)
    loss_fn = build_loss(topt["pixel_opt"])
    step_fn = make_train_step(model.apply, loss_fn, tx, ema_decay=ema_decay,
                              remat=remat, model=model)
    # While masa is frozen (reference image_restoration_ref_model.py:204-208,
    # iter < param_fix_iterations) a structurally-pruned step skips the
    # entire masa backward (~18% of the flagship 384px step).  One extra
    # jit specialization; trunk updates match step_fn's up to f32 rounding.
    fix_iters = int(topt.get("param_fix_iterations", 0) or 0)
    frozen_step_fn = None
    if fix_iters > 0:
        frozen_step_fn = make_train_step(
            model.apply, loss_fn, tx, ema_decay=ema_decay, remat=remat,
            masa_frozen=True, model=model)

    # checkpointing / auto-resume (reference :137-186)
    ckpt = CheckpointManager(opt["path"]["training_states"])
    resumed = ckpt.restore_state(state)
    start_iter = 0
    if resumed is not None:
        state = resumed
        start_iter = int(state.step)
        logger.info(f"auto-resumed from iter {start_iter}")

    state = replicate(mesh, state)

    total_iters = args.max_iters or int(topt["total_iter"])
    groups, gt_sizes, batches = progressive_buckets(ds_opt)
    writer = ScalarWriter(opt["path"]["log"],
                          opt.get("logger", {}).get("wandb"))
    msg = MessageLogger(total_iters, start_iter, writer, logger)
    rng = np.random.default_rng(opt.get("manual_seed", 0))

    log_freq = int(opt.get("logger", {}).get("print_freq", 100))
    save_freq = int(opt.get("logger", {}).get("save_checkpoint_freq", 5000))
    val_freq = int(opt.get("val", {}).get("val_freq", 5000))
    check_freq = int(opt.get("logger", {}).get("check_freq", 0))
    mixing_cfg = (topt.get("mixing_augs") or {})
    mix_rng = jax.random.PRNGKey(opt.get("manual_seed", 0) + 1)

    current_iter = start_iter
    epoch = 0
    t_data = t_iter = time.time()
    with mesh:
        while current_iter < total_iters:
            if train_loader.sampler is not None:
                train_loader.sampler.set_epoch(epoch)
            for batch in DevicePrefetcher(train_loader):
                if current_iter >= total_iters:
                    break
                current_iter += 1
                gt_size_b, mini_b = pick_bucket(current_iter, groups,
                                                gt_sizes, batches)
                mini_b = mini_b * n_dev  # per-device -> global
                host_batch = {k: np.asarray(v) for k, v in batch.items()
                              if isinstance(v, jax.Array)}
                host_batch = crop_batch(host_batch, gt_size_b, mini_b, rng)
                if matcher is not None:
                    ref_in = matcher(jnp.asarray(host_batch["lq"]),
                                     jnp.asarray(host_batch["ref"]))
                else:
                    # center-crop fallback
                    rh, rw = host_batch["ref"].shape[1:3]
                    top = max((rh - gt_size_b) // 2, 0)
                    left = max((rw - gt_size_b) // 2, 0)
                    ref_in = host_batch["ref"][:, top : top + gt_size_b,
                                               left : left + gt_size_b]
                lq_np = np.asarray(host_batch["lq"])
                gt_np = np.asarray(host_batch["gt"])
                if mixing_cfg.get("mixup"):
                    mix_rng, gt_j, lq_j = mixing_augment(
                        mix_rng, jnp.asarray(gt_np), jnp.asarray(lq_np),
                        mixing_cfg.get("mixup_beta", 1.2),
                        mixing_cfg.get("use_identity", True))
                    gt_np, lq_np = np.asarray(gt_j), np.asarray(lq_j)
                step_batch = shard_batch(mesh, {
                    "lq": lq_np,
                    "gt": gt_np,
                    "ref": np.asarray(ref_in),
                })
                data_time = time.time() - t_data
                fn = (frozen_step_fn
                      if frozen_step_fn is not None and current_iter < fix_iters
                      else step_fn)
                state, metrics = fn(state, step_batch)
                if (check_freq and current_iter % check_freq == 0
                        and jax.process_index() == 0):
                    _dump_lher(model, state, step_batch, opt, current_iter)
                if current_iter % log_freq == 0:
                    iter_time = time.time() - t_iter
                    msg(epoch, current_iter,
                        [float(sched(current_iter)),
                         float(ref_sched(current_iter))],
                        {k: float(v) for k, v in metrics.items()},
                        iter_time, data_time)
                if current_iter % save_freq == 0:
                    # Orbax saves are COLLECTIVE: every process must call
                    # (it barriers internally and writes from the primary
                    # host).  Gating on process 0 — the reference's
                    # torch.save pattern — deadlocks the gloo/ICI barrier.
                    ckpt.save_state(jax.device_get(state), current_iter)
                    ckpt.save_network(jax.device_get(state.params),
                                      jax.device_get(state.ema_params),
                                      current_iter)
                if val_loader is not None and current_iter % val_freq == 0:
                    validate(model, state, val_loader, opt, logger, writer,
                             current_iter, use_ema=ema_decay > 0)
                t_data = t_iter = time.time()
            epoch += 1

    # collective save (see note above)
    ckpt.save_state(jax.device_get(state), current_iter)
    ckpt.save_network(jax.device_get(state.params),
                      jax.device_get(state.ema_params), current_iter)
    logger.info("training done")
    return state


def _dump_lher(model, state, batch, opt, current_iter):
    """LHER (lq|gt|pred|ref) visual smoke strip every check_freq iters
    (reference image_restoration_ref_model.py:258-266)."""
    import jax.numpy as jnp
    from textualdegremoval_tpu.utils.image import tensor2img, imwrite

    out = jax.jit(model.apply)({"params": state.params},
                               batch["lq"][:1], batch["ref"][:1])
    if isinstance(out, (list, tuple)):
        out = out[-1]
    strips = [tensor2img(np.asarray(batch[k][:1])) for k in ("lq", "gt")]
    strips.append(tensor2img(np.asarray(out)))
    ref_img = tensor2img(np.asarray(batch["ref"][:1]))
    h = strips[0].shape[0]
    if ref_img.shape[0] != h:  # ref may be a different crop size
        import cv2

        ref_img = cv2.resize(ref_img, (int(ref_img.shape[1] * h /
                                           ref_img.shape[0]), h))
    strips.append(ref_img)
    lher = np.concatenate(strips, axis=1)
    imwrite(lher, os.path.join(opt["path"]["visualization"],
                               f"{current_iter:06d}.png"))


def validate(model, state, val_loader, opt, logger, writer, current_iter,
             use_ema=False):
    """Rank-0 whole-image validation, reference protocol
    (image_restoration_ref_model.py:286-298, 325-409): iterates the FULL
    val set by default (cap with val.max_minibatch for smoke runs only);
    when val.window_size is set, applies the actual pad_test — lq
    reflect-padded on the right/bottom to a window_size multiple, output
    cropped back — for archs whose internal padding differs; uses the EMA
    net when ema_decay > 0 (:303)."""
    if jax.process_index() != 0:
        return
    eval_step = make_eval_step(model.apply, use_ema=use_ema)
    val_opt = opt.get("val", {}) or {}
    max_n = val_opt.get("max_minibatch")  # None -> whole val set
    window = int(val_opt.get("window_size", 0) or 0)
    scale = int(opt.get("scale", 1))
    psnrs, ssims = [], []
    for i, batch in enumerate(val_loader):
        if max_n is not None and i >= int(max_n):
            break
        lq = np.asarray(batch["lq"])
        pad_h = pad_w = 0
        if window:
            pad_h = -lq.shape[1] % window
            pad_w = -lq.shape[2] % window
            if pad_h or pad_w:
                lq = np.pad(lq, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            "reflect")
        out = eval_step(state, {
            "lq": jnp.asarray(lq),
            "ref": jnp.asarray(batch["ref"]),
        })
        if isinstance(out, (list, tuple)):
            out = out[-1]
        out = np.asarray(out)
        out = out[:, : out.shape[1] - pad_h * scale,
                  : out.shape[2] - pad_w * scale]
        pred = np.clip(out[0], 0, 1)
        gt = np.asarray(batch["gt"])[0]
        psnrs.append(calculate_psnr(pred * 255, gt * 255, crop_border=0))
        ssims.append(calculate_ssim(pred * 255, gt * 255, crop_border=0))
    if psnrs:
        logger.info(
            f"val @ {current_iter}: psnr {np.mean(psnrs):.4f} "
            f"ssim {np.mean(ssims):.4f} ({len(psnrs)} images"
            f"{', ema' if use_ema else ''})")
        writer.write(current_iter, {"val/psnr": np.mean(psnrs),
                                    "val/ssim": np.mean(ssims)})


if __name__ == "__main__":
    main()
