"""LR schedules as optax-compatible pure functions of the step counter.

Parity with reference models/lr_scheduler.py:7-232 (the scheduler mutates
optimizer param groups there; here each schedule is a function step->lr that
optax consumes, which also makes it free inside jit).
"""

from __future__ import annotations

import math
from bisect import bisect_left

import jax.numpy as jnp
import numpy as np


def multi_step_restart_lr(base_lr, milestones, gamma=0.1, restarts=(0,),
                          restart_weights=(1,)):
    milestones = sorted(milestones)

    def schedule(step):
        step = np.asarray(step)
        # host-side schedule (used outside jit); restarts reset to weighted base
        lr = base_lr
        for r, w in zip(restarts, restart_weights):
            if step >= r:
                lr = base_lr * w
        n_decays = sum(1 for m in milestones if m <= step)
        return lr * (gamma ** n_decays)

    return schedule


def linear_lr(base_lr, total_iter):
    def schedule(step):
        return base_lr * (1.0 - jnp.asarray(step, jnp.float32) / total_iter)

    return schedule


def vibrate_lr(base_lr, total_iter):
    """Sawtooth schedule (reference VibrateLR, lr_scheduler.py:72-112)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        process = step / total_iter
        f = jnp.where(
            process < 3 / 8, 1 - process * 8 / 3,
            jnp.where(process < 5 / 8, 0.2, 0.1),
        )
        T = max(total_iter // 80, 2)
        Th = max(T // 2, 1)
        t = jnp.mod(step, T)
        f2 = jnp.where(t >= Th, 2 - t / Th, t / Th)
        weight = f * f2
        weight = jnp.where(step < Th, jnp.maximum(weight, 0.1), weight)
        return base_lr * weight

    return schedule


def cosine_annealing_restart_lr(base_lr, periods, restart_weights=(1,),
                                eta_min=0.0):
    return cosine_annealing_restart_cyclic_lr(
        base_lr, periods, restart_weights, [eta_min] * len(periods)
    )


def cosine_annealing_restart_cyclic_lr(base_lr, periods, restart_weights=(1,),
                                       eta_mins=(0.0,)):
    """Per-period eta_min cosine restarts (the schedule used by every
    reference restoration config, lr_scheduler.py:186-232)."""
    cumulative = np.cumsum(periods)
    periods = np.asarray(periods, np.float32)
    restart_weights = np.asarray(restart_weights, np.float32)
    eta_mins = np.asarray(eta_mins, np.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # idx of right-closest cumulative period
        idx = jnp.sum(step > jnp.asarray(cumulative, jnp.float32)).astype(jnp.int32)
        idx = jnp.minimum(idx, len(periods) - 1)
        nearest_restart = jnp.where(
            idx == 0, 0.0, jnp.asarray(np.concatenate([[0], cumulative[:-1]]),
                                       jnp.float32)[idx]
        )
        period = jnp.asarray(periods)[idx]
        w = jnp.asarray(restart_weights)[idx]
        emin = jnp.asarray(eta_mins)[idx]
        cos = jnp.cos(jnp.pi * (step - nearest_restart) / period)
        return emin + w * 0.5 * (base_lr - emin) * (1 + cos)

    return schedule


_SCHEDULES = {
    "MultiStepRestartLR": multi_step_restart_lr,
    "LinearLR": linear_lr,
    "VibrateLR": vibrate_lr,
    "CosineAnnealingRestartLR": cosine_annealing_restart_lr,
    "CosineAnnealingRestartCyclicLR": cosine_annealing_restart_cyclic_lr,
    # Names the reference wires in base_model.py:101-120 but never
    # implemented; map them to the cyclic variant (SURVEY.md §2.5.8).
    "CosineAnnealingWarmupRestarts": cosine_annealing_restart_cyclic_lr,
    "CosineAnnealingLRWithRestart": cosine_annealing_restart_cyclic_lr,
}


def build_schedule(base_lr: float, opt: dict):
    """Resolve a reference YAML scheduler config into step->lr."""
    opt = dict(opt)
    name = opt.pop("type")
    fn = _SCHEDULES[name]
    return fn(base_lr, **opt)


def warmup_wrap(schedule, warmup_iter: int, base_lr: float):
    """Linear warm-up modulation (reference base_model.py:183-205: linear
    ramp of the initial lr over warmup_iter, then the schedule)."""
    if warmup_iter <= 0:
        return schedule

    def warmed(step):
        step_f = jnp.asarray(step, jnp.float32)
        ramp = base_lr * step_f / warmup_iter
        return jnp.where(step_f < warmup_iter, ramp, schedule(step))

    return warmed
