"""Fused whole-NAFBlock kernel parity (ops/pallas/nafblock.py).

Same three-level chain of custody as the TransformerBlock kernel tests:
the Flax module path (whose full-size output is parity-tested against the
reference code) vs nafblock_ref (plain jnp), and nafblock_ref vs the
two-pass Pallas kernel in interpret mode, including edge tiles, multi-tile
grids, batch > 1, bf16, the odd-height fallback, and custom_vjp gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.models.layers import NAFBlock
from textualdegremoval_tpu.ops.pallas.nafblock import (
    nafblock_ref, _nafblock_impl, nafblock_fused,
)


def _extract(params):
    return {
        "norm1_w": params["norm1"]["weight"],
        "norm1_b": params["norm1"]["bias"],
        "w1": params["conv1"]["kernel"],
        "b1": params["conv1"]["bias"],
        "dw": params["conv2"]["kernel"],
        "dwb": params["conv2"]["bias"],
        "sca_w": params["sca"]["conv"]["kernel"],
        "sca_b": params["sca"]["conv"]["bias"],
        "w3": params["conv3"]["kernel"],
        "b3": params["conv3"]["bias"],
        "beta": params["beta"],
        "norm2_w": params["norm2"]["weight"],
        "norm2_b": params["norm2"]["bias"],
        "w4": params["conv4"]["kernel"],
        "b4": params["conv4"]["bias"],
        "w5": params["conv5"]["kernel"],
        "b5": params["conv5"]["bias"],
        "gamma": params["gamma"],
    }


def _setup(b=1, h=8, w=16, c=8, seed=0):
    import flax.core

    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)
    blk = NAFBlock(c, fused=False)
    params = flax.core.unfreeze(
        blk.init(jax.random.PRNGKey(seed + 1), x)["params"])
    # beta/gamma are zero-init (residual branches vanish); make them
    # non-trivial so the whole block is exercised
    params["beta"] = params["beta"] + 0.7
    params["gamma"] = params["gamma"] - 0.4
    return x, blk, params


class TestRefVsModule:
    def test_matches_module_path(self):
        x, blk, params = _setup()
        want = blk.apply({"params": params}, x)
        got = nafblock_ref(x, _extract(params))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_fused_flag_on_cpu_uses_ref(self):
        # fused=True on a CPU backend routes to nafblock_ref; outputs match
        # the module path and the param tree structure is identical
        x, blk, params = _setup()
        fused_blk = NAFBlock(8, fused=True)
        pf = fused_blk.init(jax.random.PRNGKey(1), x)["params"]
        assert jax.tree_util.tree_structure(pf) == \
            jax.tree_util.tree_structure(params)
        for (ka, a), (kb, bt) in zip(
                jax.tree_util.tree_leaves_with_path(pf),
                jax.tree_util.tree_leaves_with_path(params)):
            assert str(ka) == str(kb) and a.shape == bt.shape, (ka, kb)
        want = blk.apply({"params": params}, x)
        got = fused_blk.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_tlc_keeps_module_path(self):
        # local-pool SCA must NOT take the fused path (the pool is a box
        # filter, not a global mean)
        import flax.core

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 8))
        blk = NAFBlock(8, tlc_kernel=(4, 4), fused=False)
        params = flax.core.unfreeze(
            blk.init(jax.random.PRNGKey(3), x)["params"])
        fused_blk = NAFBlock(8, tlc_kernel=(4, 4), fused=True)
        want = blk.apply({"params": params}, x)
        got = fused_blk.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestKernelVsRef:
    @pytest.mark.parametrize("shape", [
        (1, 8, 16, 8),      # single tile: both edge masks in one step
        (1, 16, 16, 8),     # two tiles
        (2, 24, 16, 16),    # batch 2, middle tiles
        (1, 12, 16, 8),     # H forces tile-size reduction (t=4)
    ])
    def test_interpret_matches_ref(self, shape):
        x, _, params = _setup(*shape, seed=shape[1])
        p = _extract(params)
        want = nafblock_ref(x, p)
        got = _nafblock_impl(x, p, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    def test_interpret_bf16(self):
        x, _, params = _setup(1, 16, 16, 8)
        p = _extract(params)
        xb = x.astype(jnp.bfloat16)
        want = nafblock_ref(xb, p).astype(jnp.float32)
        got = _nafblock_impl(xb, p, interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=0.05)

    def test_odd_height_falls_back_to_ref(self):
        x, _, params = _setup(1, 7, 16, 8)
        p = _extract(params)
        got = _nafblock_impl(x, p, interpret=True)
        want = nafblock_ref(x, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestGrad:
    def test_custom_vjp_matches_ref_grads(self, monkeypatch):
        import textualdegremoval_tpu.ops.pallas.nafblock as nb
        monkeypatch.setattr(nb, "_INTERPRET", True)
        x, _, params = _setup(1, 8, 16, 8)
        p = _extract(params)

        def loss_fused(xx, pp):
            return jnp.sum(jnp.square(nafblock_fused(xx, pp)))

        def loss_ref(xx, pp):
            return jnp.sum(jnp.square(nafblock_ref(xx, pp)))

        gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)
        for k in gp_r:
            np.testing.assert_allclose(
                np.asarray(gp_f[k]), np.asarray(gp_r[k]),
                rtol=1e-4, atol=1e-5, err_msg=k)
