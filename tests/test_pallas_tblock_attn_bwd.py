"""Attn-half backward kernel parity (ops/pallas/tblock_attn_bwd.py).

attn_half_bwd must reproduce jax.vjp of tblock._tblock_attn_part — dx and
every weight gradient incl. temperature — in f32 interpret mode, including
edge tiles, multi-tile grids, multi-head, batch > 1, and both LN types.
The pass-A statistics it consumes are produced exactly the way the fused
forward produces them (f32 gram/square-sums of the recomputed q, k).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.ops.pallas.tblock import _tblock_attn_part
from textualdegremoval_tpu.ops.pallas.tblock_attn_bwd import attn_half_bwd

from test_pallas_tblock import _extract, _setup


def _stats_of(x, p, heads, ln_type):
    """Forward pass-A statistics, plain jnp (identical math)."""
    from textualdegremoval_tpu.ops.pallas.tblock import _ln
    c = x.shape[-1]
    y = _ln(x, p["norm1_w"], p.get("norm1_b"), ln_type)
    qkv = jnp.einsum("bhwc,cd->bhwd", y, p["qkv"].reshape(c, 3 * c))
    from textualdegremoval_tpu.ops.dwconv import dwconv_grad_shift
    qkv = dwconv_grad_shift(qkv, p["qkv_dw"])
    q, k, _ = jnp.split(qkv, 3, axis=-1)
    b = x.shape[0]
    q2 = q.reshape(b, -1, c).astype(jnp.float32)
    k2 = k.reshape(b, -1, c).astype(jnp.float32)
    gram = jnp.einsum("bpc,bpd->bcd", q2, k2)
    qssq = jnp.sum(q2 * q2, axis=1)[:, None, :]
    kssq = jnp.sum(k2 * k2, axis=1)[:, None, :]
    return gram, qssq, kssq


def _ref_bwd(x, dout, p, heads, ln_type):
    _, vjp = jax.vjp(
        lambda xx, pp: _tblock_attn_part(xx, pp, heads, ln_type), x, p)
    return vjp(dout)


@pytest.mark.parametrize("shape,t,heads", [
    ((1, 8, 16, 8), 8, 2),    # single tile: both edge masks in one step
    ((1, 16, 16, 8), 8, 1),   # two tiles, single head
    ((2, 24, 16, 16), 4, 4),  # batch 2, middle tiles, 4 heads
])
@pytest.mark.parametrize("ln_type", ["WithBias", "BiasFree"])
def test_interpret_matches_vjp(shape, t, heads, ln_type, monkeypatch):
    import textualdegremoval_tpu.ops.pallas.tblock as tb
    monkeypatch.setattr(tb, "_INTERPRET", True)

    x, _, params = _setup(*shape, heads=heads, ln_type=ln_type,
                          seed=shape[1] + heads)
    p = _extract(params)
    dout = jax.random.normal(jax.random.PRNGKey(11), x.shape)

    want_dx, want_dp = _ref_bwd(x, dout, p, heads, ln_type)
    stats = _stats_of(x, p, heads, ln_type)
    got_dx, got_dp = attn_half_bwd(x, dout, p, heads, ln_type, stats, t)

    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               rtol=2e-4, atol=2e-5)
    keys = ("qkv", "qkv_dw", "proj", "temperature", "norm1_w") + (
        ("norm1_b",) if ln_type != "BiasFree" else ())
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(got_dp[key]), np.asarray(want_dp[key]),
            rtol=2e-4, atol=2e-4, err_msg=key)


def test_full_block_custom_vjp_uses_kernel(monkeypatch):
    """tblock_fused's backward with both halves streamed must match
    autodiff of tblock_ref end-to-end (interpret mode)."""
    import textualdegremoval_tpu.ops.pallas.tblock as tb
    from textualdegremoval_tpu.ops.pallas.tblock import (
        tblock_fused, tblock_ref)
    monkeypatch.setattr(tb, "_INTERPRET", True)

    x, _, params = _setup(1, 16, 16, 8, heads=2, seed=5)
    p = _extract(params)
    dout = jax.random.normal(jax.random.PRNGKey(12), x.shape)

    def loss_f(xx, pp):
        return jnp.sum(tblock_fused(xx, pp, 2, "WithBias") * dout)

    def loss_r(xx, pp):
        return jnp.sum(tblock_ref(xx, pp, 2, "WithBias") * dout)

    gx_f, gp_f = jax.grad(loss_f, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_r, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-4, atol=3e-5)
    for key in gp_r:
        np.testing.assert_allclose(
            np.asarray(gp_f[key]), np.asarray(gp_r[key]),
            rtol=3e-4, atol=3e-4, err_msg=key)


def test_remat_mode_grads_match_save_mode(monkeypatch):
    """bwd_mode='remat' must produce the same gradients as 'save' while
    saving only (x, p): round 5 rewires the remat backward to recompute
    x1/stats transiently and reuse the streaming kernels wherever they
    apply (previously it took the two-part checkpointed ref backward,
    3.1x slower in-model)."""
    import textualdegremoval_tpu.ops.pallas.tblock as tb
    monkeypatch.setattr(tb, "_INTERPRET", True)

    x, _, params = _setup(1, 8, 16, 8, heads=2, ln_type="WithBias", seed=3)
    p = _extract(params)
    dout = jax.random.normal(jax.random.PRNGKey(5), x.shape)

    def loss(mode, xx, pp):
        y = tb.tblock_fused(xx, pp, 2, "WithBias", bwd_mode=mode)
        return jnp.sum(y.astype(jnp.float32) * dout.astype(jnp.float32))

    gx_s, gp_s = jax.grad(lambda a, b: loss("save", a, b),
                          argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(lambda a, b: loss("remat", a, b),
                          argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_s),
                               rtol=2e-4, atol=2e-5)
    for k in gp_s:
        np.testing.assert_allclose(
            np.asarray(gp_r[k]), np.asarray(gp_s[k]), rtol=2e-4, atol=2e-5,
            err_msg=k)
