"""DiffIR-style text-embedding-conditioned restoration training.

Parity target: reference DiffIRRefGuidedImageCleanModel
(models/image_restoration_text_embed_diffir_model.py:105-533): a frozen
CLIPVisionModel + frozen pretrained I2T mapper produce the pseudo-word
embedding in feed_train_data (:251-270); net_g is NAFNetDynamicFusion(lq,
embed).  Here the embedding computation is a separate jitted no-grad fn and
the step reuses the standard trainer machinery (hardcoded developer paths in
the reference — SURVEY.md §2.5.11 — become explicit arguments).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from textualdegremoval_tpu.train.trainer import (
    TrainState, make_train_step,
)


def make_embed_fn(image_encoder_apply: Callable, mapper_apply: Callable,
                  image_encoder_params, mapper_params) -> Callable:
    """(clip_view NHWC) -> (B, num_words, 1024) frozen embedding."""

    @jax.jit
    def embed(clip_view):
        image_embs = image_encoder_apply(
            {"params": image_encoder_params}, clip_view)
        return mapper_apply({"params": mapper_params}, image_embs)

    return embed


def make_diffir_train_step(net_apply: Callable, loss_fn: Callable, tx,
                           ema_decay: float = 0.999):
    """Train step where the conditioning embed is precomputed per batch."""

    base = make_train_step(
        lambda variables, lq, embed: net_apply(variables, lq, embed),
        loss_fn, tx, ema_decay=ema_decay, has_ref=True, donate=False)

    def step(state: TrainState, batch):
        # reuse the generic step by aliasing 'ref' -> embed
        return base(state, {"lq": batch["lq"], "gt": batch["gt"],
                            "ref": batch["embed"]})

    return step
