"""Routing tests for ops/flash_attn (the Pallas flash self-attention path
used by the SD UNet towers).

The kernel itself only lowers on TPU; on-chip parity + timings are
recorded in BENCH_NOTES.md (tools/bench_flash_attn.py: seq 4096 XLA
1.822 ms -> flash 0.658 ms, max|d| ~1e-3 bf16).  These tests validate the
routing contract on CPU: where the kernel applies, where it must not, and
that the UNet threads the switch through to its self-attentions only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import textualdegremoval_tpu.ops.flash_attn as fa
from textualdegremoval_tpu.ops.flash_attn import flash_applies, self_attention


class TestFlashApplies:
    def test_long_self_attn_applies(self):
        assert flash_applies(4096, 4096, 64)
        assert flash_applies(2048, 2048, 128)

    def test_short_seq_rejected(self):
        assert not flash_applies(1024, 1024, 64)   # measured wash
        assert not flash_applies(64, 64, 64)

    def test_cross_attn_rejected(self):
        assert not flash_applies(4096, 77, 64)     # UNet attn2

    def test_unaligned_rejected(self):
        assert not flash_applies(4100, 4100, 64)
        assert not flash_applies(4096, 4096, 80)   # head_dim not 64-mult
        assert not flash_applies(4096, 4096, 256)  # head_dim too large

    def test_default_off_on_cpu(self):
        assert jax.default_backend() == "cpu"
        assert not fa.flash_attn_default()


def _record_kernel(monkeypatch):
    calls = []

    def fake(q, k, v, *, sm_scale, block_sizes):
        calls.append(q.shape)
        # identical math, so downstream values stay valid
        o = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale=sm_scale)
        return o.transpose(0, 2, 1, 3)

    monkeypatch.setattr(fa, "_pallas_flash", fake)
    return calls


class TestRouting:
    def test_kernel_used_where_applies(self, monkeypatch):
        calls = _record_kernel(monkeypatch)
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 2, 64))
        out = self_attention(q, q, q, use_flash=True)
        assert calls == [(1, 2, 2048, 64)]  # BHND, once
        ref = jax.nn.dot_product_attention(q, q, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_kernel_skipped_below_threshold(self, monkeypatch):
        calls = _record_kernel(monkeypatch)
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 2, 64))
        self_attention(q, q, q, use_flash=True)
        assert calls == []

    def test_kernel_skipped_when_off(self, monkeypatch):
        calls = _record_kernel(monkeypatch)
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2048, 2, 64))
        self_attention(q, q, q, use_flash=False)
        assert calls == []


class TestUNetThreading:
    def test_unet_routes_only_long_self_attns(self, monkeypatch):
        """attn_impl='flash' on a tiny UNet: the kernel fires exactly for
        the level-0 self-attentions (seq = H*W >= threshold) and never for
        cross-attention (kv = context tokens)."""
        from textualdegremoval_tpu.models.unet import UNet2DCondition

        calls = _record_kernel(monkeypatch)
        monkeypatch.setattr(fa, "_MIN_SEQ", 256)  # tiny-shape threshold
        monkeypatch.setattr(fa, "_BLOCK", 256)
        net = UNet2DCondition(block_out_channels=(64, 128), head_dim=64,
                              layers_per_block=1, context_dim=16,
                              attn_impl="flash")
        x = jnp.zeros((1, 16, 16, 4))   # level0 seq 256, level1 seq 64
        ctx = jnp.zeros((1, 7, 16))
        params = net.init(jax.random.PRNGKey(0), x, t=jnp.zeros((1,)),
                          context=ctx)
        calls.clear()  # init traces the forward too
        net.apply(params, x, jnp.zeros((1,)), ctx)
        # level0: 1 down + 2 up self-attns at seq 256, 1 head of 64
        assert calls == [(1, 1, 256, 64)] * 3

    def test_unet_default_off_on_cpu(self, monkeypatch):
        from textualdegremoval_tpu.models.unet import UNet2DCondition

        calls = _record_kernel(monkeypatch)
        monkeypatch.setattr(fa, "_MIN_SEQ", 256)
        net = UNet2DCondition(block_out_channels=(32, 64), head_dim=32,
                              layers_per_block=1, context_dim=16)
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 7, 16))
        params = net.init(jax.random.PRNGKey(0), x, t=jnp.zeros((1,)),
                          context=ctx)
        net.apply(params, x, jnp.zeros((1,)), ctx)
        assert calls == []
