"""Whole-TransformerBlock fused kernel parity (ops/pallas/tblock.py).

Three-level chain of custody on CPU: the Flax module path (the arch whose
full-size output is parity-tested against the reference code) vs
tblock_ref (plain jnp), and tblock_ref vs the two-pass Pallas kernel in
interpret mode, including edge tiles, multi-tile grids, multi-head,
BiasFree LN, batch > 1, and custom_vjp gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.models.layers import TransformerBlock
from textualdegremoval_tpu.ops.pallas.tblock import (
    tblock_ref, _tblock_impl, tblock_fused,
)


def _extract(params):
    p = {
        "norm1_w": params["norm1"]["weight"],
        "norm2_w": params["norm2"]["weight"],
        "qkv": params["attn"]["qkv"]["kernel"],
        "qkv_dw": params["attn"]["qkv_dwconv"]["kernel"],
        "temperature": params["attn"]["temperature"],
        "proj": params["attn"]["project_out"]["kernel"],
        "gd_in": params["ffn"]["project_in"]["kernel"],
        "gd_dw": params["ffn"]["dwconv"]["kernel"],
        "gd_out": params["ffn"]["project_out"]["kernel"],
    }
    if "bias" in params["norm1"]:
        p["norm1_b"] = params["norm1"]["bias"]
        p["norm2_b"] = params["norm2"]["bias"]
    return p


def _setup(b=1, h=8, w=16, c=8, heads=2, ln_type="WithBias", seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)
    blk = TransformerBlock(c, heads, ln_type=ln_type, fused=False)
    import flax.core
    params = flax.core.unfreeze(
        blk.init(jax.random.PRNGKey(seed + 1), x)["params"])
    # non-trivial temperature so the per-head scale is exercised
    params["attn"]["temperature"] = (
        params["attn"]["temperature"] + 0.3 * jnp.arange(
            heads, dtype=jnp.float32).reshape(heads, 1, 1))
    return x, blk, params


class TestRefVsModule:
    @pytest.mark.parametrize("ln_type", ["WithBias", "BiasFree"])
    @pytest.mark.parametrize("heads", [1, 2])
    def test_matches_module_path(self, ln_type, heads):
        x, blk, params = _setup(heads=heads, ln_type=ln_type)
        want = blk.apply({"params": params}, x)
        got = tblock_ref(x, _extract(params), heads, ln_type)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_fused_flag_on_cpu_uses_ref(self):
        # fused=True on a CPU backend routes to tblock_ref; outputs match
        # the module path and the param tree structure is identical
        x, blk, params = _setup()
        fused_blk = TransformerBlock(8, 2, fused=True)
        pf = fused_blk.init(jax.random.PRNGKey(1), x)["params"]
        assert jax.tree_util.tree_structure(pf) == \
            jax.tree_util.tree_structure(params)
        want = blk.apply({"params": params}, x)
        got = fused_blk.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


class TestResFusionBlock:
    def test_fused_matches_module_path(self):
        from textualdegremoval_tpu.models.layers import (
            TransformerResFusionBlock)
        import flax.core

        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16, 8),
                              jnp.float32)
        blk = TransformerResFusionBlock(8, 2, fused=False)
        params = flax.core.unfreeze(
            blk.init(jax.random.PRNGKey(4), x)["params"])
        # alpha is zero-init (out == shortcut); make the gate non-trivial
        params["alpha"] = params["alpha"] + 0.7
        fused_blk = TransformerResFusionBlock(8, 2, fused=True)
        pf = flax.core.unfreeze(
            fused_blk.init(jax.random.PRNGKey(5), x)["params"])
        assert jax.tree_util.tree_structure(pf) == \
            jax.tree_util.tree_structure(params)
        want = blk.apply({"params": params}, x)
        got = fused_blk.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)


class TestKernelVsRef:
    @pytest.mark.parametrize("shape,heads", [
        ((1, 8, 16, 8), 2),      # single tile: both edge masks in one step
        ((1, 16, 16, 8), 1),     # two tiles
        ((2, 24, 16, 16), 4),    # batch 2, middle tiles, 4 heads
        ((1, 12, 16, 8), 2),     # H forces tile-size reduction (t=4)
    ])
    @pytest.mark.parametrize("ln_type", ["WithBias", "BiasFree"])
    def test_interpret_matches_ref(self, shape, heads, ln_type):
        x, _, params = _setup(*shape, heads=heads, ln_type=ln_type,
                              seed=shape[1])
        p = _extract(params)
        want = tblock_ref(x, p, heads, ln_type)
        got = _tblock_impl(x, p, heads, ln_type, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    def test_interpret_bf16(self):
        x, _, params = _setup(1, 16, 16, 8, heads=2)
        p = _extract(params)
        xb = x.astype(jnp.bfloat16)
        want = tblock_ref(xb, p, 2, "WithBias").astype(jnp.float32)
        got = _tblock_impl(xb, p, 2, "WithBias",
                           interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=0.05)

    def test_odd_height_falls_back_to_ref(self):
        x, _, params = _setup(1, 7, 16, 8, heads=2)
        p = _extract(params)
        got = _tblock_impl(x, p, 2, "WithBias", interpret=True)
        want = tblock_ref(x, p, 2, "WithBias")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestGrad:
    def test_custom_vjp_matches_ref_grads(self, monkeypatch):
        import textualdegremoval_tpu.ops.pallas.tblock as tb
        monkeypatch.setattr(tb, "_INTERPRET", True)
        x, _, params = _setup(1, 8, 16, 8, heads=2)
        p = _extract(params)

        def loss_fused(xx, pp):
            return jnp.sum(jnp.square(tblock_fused(xx, pp, 2, "WithBias")))

        def loss_ref(xx, pp):
            return jnp.sum(jnp.square(tblock_ref(xx, pp, 2, "WithBias")))

        gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)
        for k in gp_r:
            np.testing.assert_allclose(
                np.asarray(gp_f[k]), np.asarray(gp_r[k]),
                rtol=1e-4, atol=1e-5, err_msg=k)
