"""DiffIR text-embed-conditioned restoration training CLI.

Parity target: reference DiffIRRefGuidedImageCleanModel
(models/image_restoration_text_embed_diffir_model.py:105-533) driven
through the standard train script.  Per batch the frozen CLIP vision tower
+ frozen pretrained I2T mapper turn a 224px CLIP view of the LQ image into
the pseudo-word embedding (feed_train_data :251-270, from the LQ per the
dataset's clip_inp, restoration_dataset.py:895-927), and
net_g = NAFNetDynamicFusion(lq, embed.detach()) trains on the pixel loss
(:345).  The reference hardcodes developer checkpoint paths for the towers
(SURVEY §2.5.11); here they are YAML keys (path.pretrain_clip_vision /
path.pretrain_mapper), random-init when absent (infrastructure smoke).

TPU shape: the CLIP view is computed on device inside a jitted no-grad
embed fn (bilinear resize + CLIP normalization), the embed is a constant
input to the jitted train step (the detach() — gradients never reach the
towers), and the step runs on a dp mesh like train_restoration.

    python -m textualdegremoval_tpu.cli.train_diffir --opt <yaml>
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
from textualdegremoval_tpu.models.clip import CLIPVisionEncoder
from textualdegremoval_tpu.models.mappers import I2TMapper
from textualdegremoval_tpu.data import (
    create_dataset, create_dataloader, DevicePrefetcher,
)
from textualdegremoval_tpu.losses import build_loss
from textualdegremoval_tpu.train.schedules import build_schedule, warmup_wrap
from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state,
)
from textualdegremoval_tpu.train.diffir_trainer import make_diffir_train_step
from textualdegremoval_tpu.train.checkpoint import CheckpointManager
from textualdegremoval_tpu.parallel import make_mesh, shard_batch, replicate
from textualdegremoval_tpu.convert import load_torch_checkpoint

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def make_device_embed_fn(enc, mapper, enc_params, map_params):
    """lq (B,H,W,3 in [0,1]) -> frozen (B, num_words, D) embedding; the
    224px bilinear CLIP view is computed on device (reference
    F.interpolate + get_tensor_clip, feed_train_data :264)."""
    size = enc.image_size
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)

    @jax.jit
    def embed(lq):
        v = jax.image.resize(lq, (lq.shape[0], size, size, 3), "bilinear")
        v = (v - mean) / std
        feats = enc.apply({"params": enc_params}, v)
        return mapper.apply({"params": map_params}, feats)

    return embed


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", required=True)
    ap.add_argument("--max_iters", type=int, default=None)
    args = ap.parse_args(argv)

    from textualdegremoval_tpu.parallel.bootstrap import init_distributed
    init_distributed()

    opt = parse(args.opt, is_train=True)
    logger = get_root_logger(
        log_file=os.path.join(opt["path"]["log"], "train.log"))

    ds_opt = dict(opt["datasets"]["train"])
    per_dev_batch = ds_opt.get("batch_size_per_gpu", 1)
    n_dev = jax.local_device_count()
    mesh = make_mesh(dp=n_dev)
    ds_opt["batch_size_per_gpu"] = per_dev_batch * n_dev

    train_set = create_dataset(ds_opt)
    train_loader = create_dataloader(
        train_set, ds_opt, num_replicas=jax.process_count(),
        rank=jax.process_index())

    # frozen towers (tower sizes from YAML; tiny configs for smoke)
    clip_opt = dict(opt.get("network_clip", {}))
    enc = CLIPVisionEncoder(**clip_opt)
    map_opt = dict(opt.get("network_mapper", {}))
    mapper = I2TMapper(**map_opt)
    key = jax.random.PRNGKey(opt.get("manual_seed", 0))
    dummy_clip = jnp.zeros((1, enc.image_size, enc.image_size, 3))
    enc_params = jax.jit(enc.init)(key, dummy_clip)["params"]
    n_tokens = 1 + (enc.image_size // enc.patch_size) ** 2
    map_params = mapper.init(
        key, jnp.zeros((1, n_tokens, mapper.input_dim)))["params"]
    clip_path = opt["path"].get("pretrain_clip_vision")
    if clip_path and os.path.exists(str(clip_path)):
        enc_params = load_torch_checkpoint(clip_path)
        logger.info(f"loaded CLIP vision tower from {clip_path}")
    map_path = opt["path"].get("pretrain_mapper")
    if map_path and os.path.exists(str(map_path)):
        map_params = load_torch_checkpoint(map_path)
        logger.info(f"loaded I2T mapper from {map_path}")
    embed_fn = make_device_embed_fn(enc, mapper, enc_params, map_params)

    # net_g
    model = define_network(opt["network_g"], dtype=jnp.float32)
    gt_size = ds_opt.get("gt_size", 128)
    dummy = jnp.zeros((1, gt_size, gt_size,
                       opt["network_g"].get("img_channel", 3)))
    dummy_emb = jnp.zeros((1, mapper.num_words, mapper.output_dim))
    params = jax.jit(model.init)(key, dummy, dummy_emb)["params"]
    load_path = opt["path"].get("pretrain_network_g")
    if load_path and os.path.exists(str(load_path)):
        params = load_torch_checkpoint(load_path)
        logger.info(f"loaded pretrained net_g from {load_path}")

    topt = opt["train"]
    ema_decay = float(topt.get("ema_decay", 0) or 0)
    sched = warmup_wrap(build_schedule(topt["optim_g"]["lr"],
                                       topt["scheduler"]),
                        topt.get("warmup_iter", -1), topt["optim_g"]["lr"])
    tx = build_optimizer(
        params, sched,
        weight_decay=topt["optim_g"].get("weight_decay", 1e-4),
        betas=tuple(topt["optim_g"].get("betas", (0.9, 0.999))),
        grad_clip=0.01 if topt.get("use_grad_clip", True) else None,
    )
    state = create_train_state(params, tx)
    loss_fn = build_loss(topt["pixel_opt"])
    step_fn = make_diffir_train_step(model.apply, loss_fn, tx,
                                     ema_decay=ema_decay)

    ckpt = CheckpointManager(opt["path"]["training_states"])
    resumed = ckpt.restore_state(state)
    start_iter = 0
    if resumed is not None:
        state = resumed
        start_iter = int(state.step)
        logger.info(f"auto-resumed from iter {start_iter}")
    state = replicate(mesh, state)

    total_iters = args.max_iters or int(topt["total_iter"])
    writer = ScalarWriter(opt["path"]["log"],
                          opt.get("logger", {}).get("wandb"))
    msg = MessageLogger(total_iters, start_iter, writer, logger)
    log_freq = int(opt.get("logger", {}).get("print_freq", 100))
    save_freq = int(opt.get("logger", {}).get("save_checkpoint_freq", 10 ** 9))

    current_iter = start_iter
    epoch = 0
    t_iter = time.time()
    while current_iter < total_iters:
        prefetch = DevicePrefetcher(iter(train_loader))
        for batch in prefetch:
            if current_iter >= total_iters:
                break
            current_iter += 1
            embed = embed_fn(batch["lq"])
            dev_batch = shard_batch(mesh, {
                "lq": batch["lq"], "gt": batch["gt"], "embed": embed})
            state, metrics = step_fn(state, dev_batch)
            if current_iter % log_freq == 0:
                now = time.time()
                msg(epoch, current_iter, [float(sched(current_iter))],
                    {k: float(v) for k, v in metrics.items()},
                    now - t_iter, 0.0)
                t_iter = now
            if current_iter % save_freq == 0:
                ckpt.save_state(jax.device_get(state), current_iter)
                ckpt.save_network(jax.device_get(state.params),
                                  jax.device_get(state.ema_params),
                                  current_iter)
        epoch += 1

    ckpt.save_state(jax.device_get(state), current_iter)
    ckpt.save_network(jax.device_get(state.params),
                      jax.device_get(state.ema_params), current_iter)
    logger.info("training done")
    return state


if __name__ == "__main__":
    main()
