"""Jitted training step for guided restoration.

Reference semantics (models/image_restoration_ref_model.py +
models/base_model.py) re-expressed functionally:

* two AdamW groups split on 'masa' in the param path with separate lr
  (ref_lr) — :141-181;
* masa params frozen until `param_fix_iterations` — :205-212 (implemented as
  grad+update masking, exact because the freeze is an initial prefix so Adam
  moments are zero throughout it);
* global grad-norm clip 0.01 — :277-279;
* EMA of params (decay from opt, usually 0.999ish) — base_model.py:54-62;
* loss all-reduce for logging is free (global-mean loss under jit+sharding).

The step is a pure function (TrainState, batch) -> (TrainState, metrics),
jit-compiled once per (gt_size, batch) bucket of the progressive schedule.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
import flax.traverse_util as traverse_util


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    # extra variable collections (e.g. SFNet's DynamicFilter BatchNorm
    # batch_stats); empty dict for the LN-only backbones
    model_state: Any = struct.field(default_factory=dict)


def _masa_mask(params) -> Any:
    """Pytree of bools: True where the param belongs to the MASA matcher
    (path contains 'masa' — same substring rule as the reference)."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: ("masa" in "/".join(k).lower()) for k in flat}
    return traverse_util.unflatten_dict(mask)


def build_optimizer(
    params,
    lr_schedule: Callable,
    ref_lr_schedule: Callable | None = None,
    weight_decay: float = 1e-4,
    betas: tuple[float, float] = (0.9, 0.999),
    grad_clip: float | None = 0.01,
    param_fix_iterations: int = 0,
) -> optax.GradientTransformation:
    mask = _masa_mask(params)
    inv_mask = jax.tree_util.tree_map(lambda b: not b, mask)
    ref_lr_schedule = ref_lr_schedule or lr_schedule

    def adamw(sched):
        return optax.adamw(sched, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)

    labels = jax.tree_util.tree_map(
        lambda is_masa: "masa" if is_masa else "trunk", mask
    )
    tx = optax.chain(
        *([optax.clip_by_global_norm(grad_clip)] if grad_clip else []),
        optax.multi_transform(
            {"trunk": adamw(lr_schedule), "masa": adamw(ref_lr_schedule)}, labels
        ),
    )

    if param_fix_iterations > 0:
        # Zero masa grads going in AND masa updates coming out (the latter
        # kills AdamW weight decay during the freeze).  Because the freeze is
        # an initial prefix of training, Adam moments stay exactly zero
        # through it — faithful to requires_grad=False semantics.
        tx = optax.chain(
            _mask_while(mask, param_fix_iterations),
            tx,
            _mask_while(mask, param_fix_iterations),
        )
    return tx


def _mask_while(mask, fix_iters: int) -> optax.GradientTransformation:
    """Zero masked entries of the update tree while step < fix_iters."""

    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        live = (state.count >= fix_iters).astype(jnp.float32)
        updates = jax.tree_util.tree_map(
            lambda u, m: u * live if m else u, updates, mask
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def create_train_state(params, tx, model_state=None,
                       ema_params=None) -> TrainState:
    """ema_params: pre-loaded EMA tree (a pretrain checkpoint's params_ema,
    reference base_model.py:121-125); defaults to a copy of params (the
    reference's model_ema(0) weight copy)."""
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=(ema_params if ema_params is not None
                    else jax.tree_util.tree_map(jnp.copy, params)),
        model_state=model_state or {},
    )


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.999,
    has_ref: bool = True,
    donate: bool = True,
    remat: bool = False,
    masa_frozen: bool = False,
    model=None,
):
    """Build the jitted (state, batch) -> (state, metrics) step.

    apply_fn: (params, lq[, ref]) -> pred (or tuple of multi-scale preds).
    loss_fn: (pred, gt) -> scalar; applied per output and summed for
    multi-output models (SFNet's 3-scale supervision pattern).
    remat: rematerialize the forward during backward (jax.checkpoint) —
    trades ~30% step FLOPs for activation memory, enabling the reference's
    batch-8 384px protocol per chip at full resolution.  When the model
    uses the fused block kernels, construct it with bwd_mode='remat' too
    (models/layers.py TransformerBlock.bwd_mode) so the kernels use their
    memory-lean backward — the CLI threads both from one flag.
    masa_frozen: structurally skip the MASA backward.  The reference's
    freeze phase (image_restoration_ref_model.py:204-208,
    param_fix_iterations) sets requires_grad=False, which prunes the masa
    encoder/match/warp backward from the autograd graph entirely; the
    optax grad-masking in build_optimizer only zeroes grads AFTER
    computing them.  This flag stop_gradients the masa param subtree
    inside the loss, so XLA drops that backward at trace time (~18% of
    the flagship 384px step).  The CLI compiles one step per phase and
    switches at param_fix_iterations; trunk updates match the masking
    path up to f32 fusion rounding (the masking runs before the global
    clip, so the clip sees zero masa grads either way).
    ema_decay: reference train.ema_decay semantics (base_model.py:108-126,
    default 0 = EMA off).  When <= 0 the state's ema_params tree simply
    aliases params each step (no extra arrays, no flops), so checkpoints
    and eval paths stay structurally identical either way.
    model: optional — the Flax module behind apply_fn, used only for a
    configuration sanity check: remat=True with a model whose fused block
    kernels keep bwd_mode='save' silently loses most of the memory benefit
    (the kernels keep their x1/stats residuals alive through the
    jax.checkpoint recompute); pair remat=True with bwd_mode='remat' as
    the CLI does (cli/train_restoration.py resolve_network).
    """
    if remat and model is not None:
        fused = getattr(model, "fused", False)
        if fused is None:
            from textualdegremoval_tpu.models.layers import (
                _fused_tblock_default)
            fused = _fused_tblock_default()
        if fused and getattr(model, "bwd_mode", None) != "remat":
            import warnings
            warnings.warn(
                "make_train_step(remat=True) with fused block kernels in "
                "bwd_mode='save': the kernels save their attn-boundary "
                "residuals anyway, so most of remat's memory benefit is "
                "lost.  Construct the model with bwd_mode='remat' "
                "(models/layers.py) to pair the memory-lean kernel "
                "backward with jax.checkpoint.", stacklevel=2)
    if remat:
        apply_fn = jax.checkpoint(
            apply_fn, policy=jax.checkpoint_policies.nothing_saveable)

    def step(state: TrainState, batch):
        has_mutable = bool(state.model_state)

        def compute_loss(params):
            if masa_frozen:
                mask = _masa_mask(params)
                params = jax.tree_util.tree_map(
                    lambda p, m: jax.lax.stop_gradient(p) if m else p,
                    params, mask)
            args = (batch["lq"], batch["ref"]) if has_ref else (batch["lq"],)
            variables = {"params": params, **state.model_state}
            if has_mutable:
                preds, new_model_state = apply_fn(
                    variables, *args, mutable=list(state.model_state))
            else:
                preds = apply_fn(variables, *args)
                new_model_state = state.model_state
            if not isinstance(preds, (list, tuple)):
                preds = [preds]
            total = jnp.asarray(0.0, jnp.float32)
            for p in preds:
                gt = batch["gt"]
                if p.shape[1] != gt.shape[1]:  # multi-scale supervision
                    gt = jax.image.resize(gt, p.shape, method="bilinear")
                total = total + loss_fn(p, gt)
            return total, new_model_state

        (loss_val, model_state), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, params,
            )
        else:
            ema = params  # EMA off: ema tree aliases the live params
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema,
                               model_state=model_state)
        metrics = {"l_pix": loss_val,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable, has_ref: bool = True, use_ema: bool = True):
    @functools.partial(jax.jit, static_argnums=())
    def step(state: TrainState, batch):
        params = state.ema_params if use_ema else state.params
        args = (batch["lq"], batch["ref"]) if has_ref else (batch["lq"],)
        return apply_fn({"params": params}, *args)

    return step
