"""I2T Mapper and TR CleanMapper.

Parity targets:
* Mapper — reference scripts/train/main_train_i2t_mapping.py:40-81: per
  pseudo-word, a 4-layer MLP on the CLIP CLS embedding plus a 4-layer MLP on
  the mean-pooled patch embeddings; num_words outputs of width output_dim.
* CleanMapper — reference scripts/train/main_train_tr_mapping.py:84-122:
  per-word MLP mapping degraded word i -> clean word i.

TPU-first: instead of 2*num_words separate small Linears dispatched in a
Python loop, the per-word weights are stacked into batched (num_words, in,
out) tensors and applied with one einsum per layer — num_words MLPs become 4
MXU matmuls.  The checkpoint converter folds the reference's mapping_{i}.*
weights into the stacked layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class WordMLPs(nn.Module):
    """num_words parallel 4-layer MLPs: in -> 1280 (LN, LeakyReLU) x3 -> out."""

    num_words: int
    input_dim: int
    hidden_dim: int = 1280
    output_dim: int = 1024
    diagonal: bool = False  # word i consumes token i (CleanMapper dispatch)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T, input_dim) token stream.

        diagonal=False: every word-MLP runs on every token ->
        (B, T, num_words, output_dim).
        diagonal=True: T must equal num_words; word-MLP i runs on token i ->
        (B, num_words, output_dim)."""
        w = self.num_words
        dims = [self.input_dim, self.hidden_dim, self.hidden_dim,
                self.hidden_dim, self.output_dim]
        if self.diagonal:
            h = x.astype(self.dtype)  # (B, W, D)
        else:
            h = x.astype(self.dtype)[:, :, None, :]  # (B, T, 1, D)
            h = jnp.broadcast_to(h, h.shape[:2] + (w, h.shape[-1]))
        eq = "bwi,wio->bwo" if self.diagonal else "btwi,wio->btwo"
        for li in range(4):
            kernel = self.param(f"linear{li}_kernel",
                                nn.initializers.lecun_normal(),
                                (w, dims[li], dims[li + 1]))
            bias = self.param(f"linear{li}_bias", nn.initializers.zeros,
                              (w, dims[li + 1]))
            h = jnp.einsum(eq, h, kernel.astype(self.dtype)) + \
                bias.astype(self.dtype)
            if li < 3:
                ln_w = self.param(f"ln{li}_weight", nn.initializers.ones,
                                  (w, dims[li + 1]))
                ln_b = self.param(f"ln{li}_bias", nn.initializers.zeros,
                                  (w, dims[li + 1]))
                mu = jnp.mean(h, axis=-1, keepdims=True)
                var = jnp.var(h, axis=-1, keepdims=True)
                h = (h - mu) / jnp.sqrt(var + 1e-5)
                h = h * ln_w.astype(self.dtype) + ln_b.astype(self.dtype)
                h = jax.nn.leaky_relu(h, negative_slope=0.01)
        return h


class I2TMapper(nn.Module):
    """CLIP image embedding (B, 257, 1280) -> (B, num_words, output_dim)."""

    num_words: int = 20
    input_dim: int = 1280
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embs):
        cls = image_embs[:, :1]  # (B, 1, D)
        patches = image_embs[:, 1:]  # (B, P, D)
        # reference semantics (main_train_i2t_mapping.py:75-79): the patch
        # MLP runs on EVERY patch token and the outputs are averaged (the
        # MLP is nonlinear, so pool-after, not pool-before)
        h_cls = WordMLPs(self.num_words, self.input_dim,
                         output_dim=self.output_dim, dtype=self.dtype,
                         name="mapping")(cls)[:, 0]
        h_patch = WordMLPs(self.num_words, self.input_dim,
                           output_dim=self.output_dim, dtype=self.dtype,
                           name="mapping_patch")(patches).mean(axis=1)
        return h_cls + h_patch


class CleanMapper(nn.Module):
    """Degraded word embeddings -> clean word embeddings, word i -> word i."""

    num_words: int = 20
    dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, word_embs):
        """word_embs: (B, num_words, dim); word i -> mapping_i(word_i)."""
        return WordMLPs(self.num_words, self.dim, output_dim=self.dim,
                        diagonal=True, dtype=self.dtype,
                        name="mapping")(word_embs)
