"""Streaming (flash) self-attention routing for the frozen-tower models.

The reference leans on xformers' ``memory_efficient_attention`` CUDA kernel
for its towers when available (models/dino/attention.py:24-33,72-88); the
TPU-native equivalent is the Pallas TPU flash-attention kernel.  The XLA
path (`jax.nn.dot_product_attention`) materializes the per-head (seq, seq)
logits — ~167 MB/layer of HBM traffic at seq 4096 bf16 — while the flash
kernel streams K/V blocks through VMEM.

Measured on one v5e chip (tools/bench_flash_attn.py, device-side chain,
CFG batch 2, head_dim 64, bf16):

  seq 4096 (SD UNet level-0 self-attn): XLA 1.822 ms -> flash 0.658 ms
    (2.77x); seq <= 1024: a wash (sub-50us ops, dispatch-bound).

So routing applies only where it wins: self-attention, seq >= 2048,
block-aligned.  Numerics: max |d| ~1e-3 in bf16 (one bf16 ulp at these
magnitudes) from the streaming softmax reassociation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as _pallas_flash)

# Process-wide default, resolved once at import (same contract as the
# models/layers.py kernel knobs): explicit $TDR_FLASH_ATTN wins; otherwise
# ON iff the default backend is TPU.
_FLASH_ATTN_ENV = os.environ.get("TDR_FLASH_ATTN")
_MIN_SEQ = 2048
_BLOCK = 512


def flash_attn_default() -> bool:
    """Resolution of attn_impl=None for the tower attention modules."""
    if _FLASH_ATTN_ENV is not None:
        return _FLASH_ATTN_ENV in ("1", "true", "on")
    return jax.default_backend() == "tpu"


def flash_applies(q_seq: int, kv_seq: int, head_dim: int) -> bool:
    """Shapes where the kernel is measured to win AND satisfies its block
    constraints.  Below _MIN_SEQ the op is dispatch-bound and XLA ties or
    wins (tools/bench_flash_attn.py)."""
    return (q_seq == kv_seq and q_seq >= _MIN_SEQ and q_seq % _BLOCK == 0
            and head_dim % 64 == 0 and head_dim <= 128)


def self_attention(q, k, v, *, use_flash: bool):
    """Multi-head self-attention over BNHD tensors (batch, seq, heads,
    head_dim), scaled by head_dim**-0.5.  Routes to the Pallas flash
    kernel where `flash_applies`, else the XLA path — identical math."""
    _, n, _, d = q.shape
    if use_flash and flash_applies(n, k.shape[1], d):
        o = _pallas_flash(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=d ** -0.5,
            block_sizes=_block_sizes(n))
        return o.transpose(0, 2, 1, 3)
    return jax.nn.dot_product_attention(q, k, v)


def _block_sizes(seq: int) -> BlockSizes:
    b = min(_BLOCK, seq)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b,
        block_q_dkv=b, block_k_dkv=b,
        block_q_dq=b, block_k_dq=b, block_k_major_dq=b)
