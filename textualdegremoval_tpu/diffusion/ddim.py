"""DDIM scheduler + fused classifier-free-guidance sampler.

Parity target: diffusers DDIMScheduler as used by the reference
(scaled_linear betas 0.00085..0.012, 1000 train steps, steps_offset 1,
eta=0) and the reference's 100-step CFG loop
(main_train_tr_mapping.py:535-560: two UNet forwards per step, guidance
scale 5, final decode).

TPU-first: the whole sampler is ONE `lax.scan` over timesteps, jitted; the
cond/uncond pair runs as a single batch-2N UNet forward per step (the
reference dispatches two separate forwards).  alphas_cumprod tables are
computed in float64-equivalent float32 at trace time (constants).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "epsilon"  # or "v_prediction"
    steps_offset: int = 1

    @property
    def alphas_cumprod(self) -> np.ndarray:
        betas = np.linspace(
            self.beta_start ** 0.5, self.beta_end ** 0.5,
            self.num_train_timesteps, dtype=np.float64) ** 2
        return np.cumprod(1.0 - betas).astype(np.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
        return (ts + self.steps_offset).astype(np.int32)

    def add_noise(self, x0, noise, t):
        acp = jnp.asarray(self.alphas_cumprod)[t]
        while acp.ndim < x0.ndim:
            acp = acp[..., None]
        return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise

    def velocity(self, x0, noise, t):
        """v-prediction target: sqrt(acp)*eps - sqrt(1-acp)*x0."""
        acp = jnp.asarray(self.alphas_cumprod)[t]
        while acp.ndim < x0.ndim:
            acp = acp[..., None]
        return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0

    def step(self, model_out, t, t_prev, sample):
        """Deterministic DDIM step (eta=0)."""
        acp = jnp.asarray(self.alphas_cumprod)
        a_t = acp[t]
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1 - a_t) * model_out) / jnp.sqrt(a_t)
            eps = model_out
        else:  # v_prediction
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(1 - a_t) * model_out
            eps = jnp.sqrt(a_t) * model_out + jnp.sqrt(1 - a_t) * sample
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


def cfg_sample(
    eps_fn: Callable,
    scheduler: DDIMScheduler,
    latents: jnp.ndarray,
    cond_context: jnp.ndarray,
    uncond_context: jnp.ndarray,
    num_inference_steps: int = 100,
    guidance_scale: float = 5.0,
):
    """Fused DDIM CFG sampling loop.

    Args:
      eps_fn: (latents_2b, t_2b, context_2b) -> model outputs; the caller
        binds UNet params (and use_global_kv flags) into it.
      latents: (B, h, w, 4) initial noise.
      cond_context / uncond_context: (B, S, D) text states.
    Returns final latents (B, h, w, 4).
    """
    ts = jnp.asarray(scheduler.timesteps(num_inference_steps))
    ratio = scheduler.num_train_timesteps // num_inference_steps
    ts_prev = ts - ratio
    context = jnp.concatenate([uncond_context, cond_context], axis=0)

    def body(lat, t_pair):
        t, t_prev = t_pair
        b = lat.shape[0]
        lat2 = jnp.concatenate([lat, lat], axis=0)
        tt = jnp.full((2 * b,), t, jnp.int32)
        out = eps_fn(lat2, tt, context)
        out_u, out_c = jnp.split(out, 2, axis=0)
        guided = out_u + guidance_scale * (out_c - out_u)
        lat = scheduler.step(guided, t, t_prev, lat)
        return lat, None

    final, _ = jax.lax.scan(body, latents, (ts, ts_prev))
    return final
