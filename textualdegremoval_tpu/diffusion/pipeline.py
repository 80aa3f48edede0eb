"""Pipeline A: textual guidance generation — training and inference.

Reference call stacks (SURVEY.md §3.2-3.4):
* I2T training (main_train_i2t_mapping.py:704-786): frozen VAE/UNet/text/
  image encoders; trainable = I2T mapper MLPs + the UNet's
  to_k_global/to_v_global projections; loss = MSE(eps_pred, eps) with
  pseudo-words injected into the text stream of the *degraded* CLIP view
  while latents come from the GT image.
* TR training (main_train_tr_mapping.py): frozen I2T mapper, trainable
  CleanMapper stacked after it.  (The reference optimizes the wrong module —
  SURVEY.md §2.5.3; here the CleanMapper is the trained one, as intended.)
* Generation (main_generate_reference.py): CLIP-encode the degraded image,
  map to clean pseudo-words, inject, 100-step DDIM CFG (scale 5), decode.

Everything here is functional: modules + params in, arrays out; each step is
one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
import flax.traverse_util as traverse_util

from textualdegremoval_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from textualdegremoval_tpu.models.mappers import I2TMapper, CleanMapper
from textualdegremoval_tpu.models.unet import UNet2DCondition
from textualdegremoval_tpu.models.vae import AutoencoderKL, SCALING_FACTOR
from textualdegremoval_tpu.diffusion.ddim import DDIMScheduler, cfg_sample


@dataclasses.dataclass
class GuidanceModules:
    """The five towers of pipeline A (construct once, thread params)."""

    text_encoder: CLIPTextEncoder
    image_encoder: CLIPVisionEncoder
    unet: UNet2DCondition
    vae: AutoencoderKL
    mapper: I2TMapper
    clean_mapper: CleanMapper | None = None
    scheduler: DDIMScheduler = dataclasses.field(default_factory=DDIMScheduler)

    @classmethod
    def small_test_config(cls, num_words=4):
        """Tiny towers for tests/CI — same wiring, toy sizes."""
        return cls(
            text_encoder=CLIPTextEncoder(vocab_size=100, max_positions=16,
                                         width=64, layers=2, heads=4),
            image_encoder=CLIPVisionEncoder(image_size=28, patch_size=14,
                                            width=32, layers=2, heads=2),
            unet=UNet2DCondition(block_out_channels=(32, 64),
                                 layers_per_block=1, context_dim=64,
                                 head_dim=16),
            vae=AutoencoderKL(block_out_channels=(16, 32),
                              layers_per_block=1),
            mapper=I2TMapper(num_words=num_words, input_dim=32,
                             output_dim=64),
            clean_mapper=CleanMapper(num_words=num_words, dim=64),
        )

    @classmethod
    def sd21_config(cls, num_words=20, dtype=jnp.float32):
        """dtype=jnp.bfloat16 is the TPU equivalent of the reference's fp16
        mixed precision (params stay f32; activations compute in dtype)."""
        return cls(
            text_encoder=CLIPTextEncoder(dtype=dtype),
            image_encoder=CLIPVisionEncoder(dtype=dtype),
            unet=UNet2DCondition(dtype=dtype),
            vae=AutoencoderKL(dtype=dtype),
            mapper=I2TMapper(num_words=num_words),
            clean_mapper=CleanMapper(num_words=num_words),
        )


def encode_pseudo_words(mods: GuidanceModules, params: dict, clip_view,
                        use_clean_mapper: bool = False):
    """CLIP image -> (clean) pseudo-word embeddings (B, num_words, D)."""
    image_embs = mods.image_encoder.apply(
        {"params": params["image_encoder"]}, clip_view)
    words = mods.mapper.apply({"params": params["mapper"]}, image_embs)
    if use_clean_mapper:
        words = mods.clean_mapper.apply(
            {"params": params["clean_mapper"]}, words)
    return words


def text_states_with_injection(mods: GuidanceModules, params: dict,
                               input_ids, inj_embedding, inj_index):
    hidden, _ = mods.text_encoder.apply(
        {"params": params["text_encoder"]}, input_ids,
        inj_embedding=inj_embedding, inj_index=inj_index)
    return hidden


def diffusion_loss(mods: GuidanceModules, params: dict, batch, rng,
                   use_clean_mapper: bool = False, remat: bool = False):
    """The shared eps-MSE loss for I2T / TR training.

    batch: pixel_values (B,H,W,3 in [-1,1] SD view of the target image),
           pixel_values_clip (B,224,224,3 CLIP view),
           input_ids (B,S), inj_index (B,).
    remat: jax.checkpoint the UNet forward — gradients w.r.t. the injected
    text states flow through every UNet layer, so without remat the whole
    891M-param UNet's activations (incl. 4096-token self-attention logits)
    are saved for backward; with remat they are recomputed and the step
    fits a single 16 GB chip at the reference's batch 4 @ 512 px.
    """
    rng_noise, rng_t, rng_vae = jax.random.split(rng, 3)
    latents = mods.vae.apply(
        {"params": params["vae"]}, batch["pixel_values"], rng_vae,
        method=AutoencoderKL.encode_sample) * SCALING_FACTOR
    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    b = latents.shape[0]
    t = jax.random.randint(rng_t, (b,), 0,
                           mods.scheduler.num_train_timesteps)
    noisy = mods.scheduler.add_noise(latents, noise, t)

    words = encode_pseudo_words(mods, params, batch["pixel_values_clip"],
                                use_clean_mapper)
    hidden = text_states_with_injection(
        mods, params, batch["input_ids"], words, batch["inj_index"])

    def unet_fn(unet_params, noisy, t, hidden):
        return mods.unet.apply({"params": unet_params}, noisy, t, hidden,
                               use_global_kv=True)

    if remat:
        unet_fn = jax.checkpoint(unet_fn)
    eps_pred = unet_fn(params["unet"], noisy, t, hidden)
    # loss reduces in f32 even under bf16 towers (mixed-precision norm)
    return jnp.mean(jnp.square(
        eps_pred.astype(jnp.float32) - noise.astype(jnp.float32)))


def trainable_mask(params: dict, stage: str) -> dict:
    """Which params train: I2T stage = mapper + UNet global k/v;
    TR stage = clean_mapper only."""
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for k in flat:
        path = "/".join(str(p) for p in k)
        if stage == "i2t":
            mask[k] = path.startswith("mapper/") or "global" in path
        elif stage == "tr":
            mask[k] = path.startswith("clean_mapper/")
        else:
            raise ValueError(stage)
    return traverse_util.unflatten_dict(mask)


def partition_params(params: dict, stage: str):
    """Split params into (trainable, frozen) flat dicts by trainable_mask."""
    mask = traverse_util.flatten_dict(trainable_mask(params, stage))
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if mask[k]}
    frozen = {k: v for k, v in flat.items() if not mask[k]}
    return train, frozen


def merge_params(train: dict, frozen: dict) -> dict:
    return traverse_util.unflatten_dict({**train, **frozen})


def guidance_loss_and_grads(mods: GuidanceModules, params, batch, rng,
                            stage: str, remat: bool = False):
    """(loss, full-tree grads) differentiating ONLY the trainable subtree.

    The frozen towers are captured as constants, so the backward pass never
    descends into the VAE or CLIP-vision weights and no tower-sized grad
    buffers exist (the torch equivalent of requires_grad=False — reference
    main_train_i2t_mapping.py freezes the towers; a full-tree
    value_and_grad would OOM a 16 GB chip on the 891M-param setup).
    Frozen entries of the returned tree are zeros, so any optimizer built
    by make_guidance_optimizer consumes it unchanged."""
    use_clean = stage == "tr"
    train_p, frozen_p = partition_params(params, stage)

    def loss_fn(tp):
        return diffusion_loss(mods, merge_params(tp, frozen_p), batch, rng,
                              use_clean, remat)

    loss, gtrain = jax.value_and_grad(loss_fn)(train_p)
    zeros = {k: jnp.zeros_like(v) for k, v in frozen_p.items()}
    return loss, traverse_util.unflatten_dict({**gtrain, **zeros})


def make_guidance_train_step(mods: GuidanceModules, tx, stage: str,
                             remat: bool = False):
    def step(params, opt_state, batch, rng):
        loss, grads = guidance_loss_and_grads(mods, params, batch, rng,
                                              stage, remat)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_guidance_optimizer(params, stage: str, lr: float = 1e-6,
                            grad_clip: float = 1.0):
    mask = trainable_mask(params, stage)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.masked(optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=1e-2),
                     mask),
        _zero_frozen(mask),
    )
    return tx


def _zero_frozen(mask):
    """Hard-zero updates of frozen params (masked() already skips state, this
    guards the weight-decay path)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask)
        return updates, state

    return optax.GradientTransformation(init, update)


def generate_reference(mods: GuidanceModules, params: dict, clip_view,
                       input_ids, uncond_ids, inj_index, rng,
                       latent_hw: tuple[int, int] = (64, 64),
                       num_inference_steps: int = 100,
                       guidance_scale: float = 5.0,
                       use_clean_mapper: bool = True,
                       token_index: int | None = None):
    """Degraded image -> clean reference image (values in [-1, 1]).

    token_index: inject only pseudo-word `token_index` instead of all
    (reference validation's token_index flag, main_train_i2t_mapping:483)."""
    b = clip_view.shape[0]
    words = encode_pseudo_words(mods, params, clip_view, use_clean_mapper)
    if token_index is not None:
        words = words[:, token_index : token_index + 1]
    cond = text_states_with_injection(mods, params, input_ids, words,
                                      inj_index)
    uncond, _ = mods.text_encoder.apply(
        {"params": params["text_encoder"]}, uncond_ids)

    latents = jax.random.normal(
        rng, (b, latent_hw[0], latent_hw[1], mods.unet.in_channels))

    def eps_fn(lat, t, ctx):
        return mods.unet.apply({"params": params["unet"]}, lat, t, ctx,
                               use_global_kv=True)

    final = cfg_sample(eps_fn, mods.scheduler, latents, cond, uncond,
                       num_inference_steps, guidance_scale)
    image = mods.vae.apply({"params": params["vae"]},
                           final / SCALING_FACTOR,
                           method=AutoencoderKL.decode)
    return image
