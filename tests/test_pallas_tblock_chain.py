"""Chained whole-TransformerBlock kernel parity (tblock_chain_fused).

The chain fuses pass B of block i with pass A of block i+1 (a 1-row stash
of the previous output tile supplies the stats halo), so each intermediate
activation crosses HBM once instead of being re-read by the next block's
stats pass.  Chain output must equal the sequential tblock_ref chain
bit-for-bit in f32 interpret mode, including edge tiles, multi-tile grids,
batch > 1, and custom_vjp gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.models.layers import TransformerBlock
from textualdegremoval_tpu.ops.pallas.tblock import (
    tblock_ref, _tblock_chain_impl, tblock_chain_fused,
)

from test_pallas_tblock import _extract, _setup


def _setup_chain(n_blocks, b=1, h=8, w=16, c=8, heads=2,
                 ln_type="WithBias", seed=0):
    x, _, _ = _setup(b, h, w, c, heads, ln_type, seed)
    ps = []
    for i in range(n_blocks):
        _, _, params = _setup(b, h, w, c, heads, ln_type, seed + 7 * i + 1)
        ps.append(_extract(params))
    return x, tuple(ps)


def _chain_ref(x, ps, heads, ln_type):
    for p in ps:
        x = tblock_ref(x, p, heads, ln_type)
    return x


class TestChainVsRef:
    @pytest.mark.parametrize("shape,n_blocks", [
        ((1, 8, 16, 8), 2),    # single tile: both edge masks in one step
        ((1, 16, 16, 8), 3),   # two tiles, 3 blocks
        ((2, 24, 16, 16), 2),  # batch 2, middle tiles
        ((1, 12, 16, 8), 4),   # H forces tile-size reduction
    ])
    @pytest.mark.parametrize("ln_type", ["WithBias", "BiasFree"])
    def test_interpret_matches_sequential_ref(self, shape, n_blocks,
                                              ln_type):
        x, ps = _setup_chain(n_blocks, *shape, ln_type=ln_type,
                             seed=shape[1] + n_blocks)
        want = _chain_ref(x, ps, 2, ln_type)
        got = _tblock_chain_impl(x, ps, 2, ln_type, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=4e-5, atol=4e-5)

    def test_single_block_delegates(self):
        x, ps = _setup_chain(1)
        want = tblock_ref(x, ps[0], 2, "WithBias")
        got = _tblock_chain_impl(x, ps, 2, "WithBias", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5, atol=3e-5)

    def test_empty_chain_is_identity(self):
        x, _ = _setup_chain(1)
        got = _tblock_chain_impl(x, (), 2, "WithBias", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x))

    def test_odd_height_falls_back_to_ref(self):
        x, ps = _setup_chain(2, 1, 7, 16, 8)
        want = _chain_ref(x, ps, 2, "WithBias")
        got = _tblock_chain_impl(x, ps, 2, "WithBias", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_interpret_bf16(self):
        x, ps = _setup_chain(2, 1, 16, 16, 8)
        xb = x.astype(jnp.bfloat16)
        want = _chain_ref(xb, ps, 2, "WithBias").astype(jnp.float32)
        got = _tblock_chain_impl(
            xb, ps, 2, "WithBias", interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.06, atol=0.06)


class TestModelChainMode:
    def test_restormer_chain_mode_matches_and_shares_params(self):
        # chain mode (explicit chain=True constructor attribute) on a CPU
        # backend routes through tblock_ref sequentially; outputs match
        # the per-block module path and the param tree is identical
        # (checkpoint interchange)
        import flax.core
        from textualdegremoval_tpu.models.restormer import Restormer

        kw = dict(dim=8, num_blocks=(2, 1, 1, 1), num_refinement_blocks=1,
                  heads=(1, 1, 2, 2))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
        base = Restormer(**kw, chain=False)
        params = flax.core.unfreeze(
            base.init(jax.random.PRNGKey(1), x)["params"])
        want = base.apply({"params": params}, x)

        chained = Restormer(**kw, chain=True)
        pc = chained.init(jax.random.PRNGKey(1), x)["params"]
        assert jax.tree_util.tree_structure(pc) == \
            jax.tree_util.tree_structure(params)
        got = chained.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestChainGrad:
    def test_custom_vjp_matches_ref_grads(self, monkeypatch):
        import textualdegremoval_tpu.ops.pallas.tblock as tb
        monkeypatch.setattr(tb, "_INTERPRET", True)
        x, ps = _setup_chain(2, 1, 8, 16, 8)

        def loss_fused(xx, pp):
            return jnp.sum(jnp.square(tblock_chain_fused(xx, pp, 2)))

        def loss_ref(xx, pp):
            return jnp.sum(jnp.square(_chain_ref(xx, pp, 2, "WithBias")))

        gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, ps)
        gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, ps)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=2e-4, atol=2e-5)
        for i in range(len(gp_r)):
            for k in gp_r[i]:
                np.testing.assert_allclose(
                    np.asarray(gp_f[i][k]), np.asarray(gp_r[i][k]),
                    rtol=2e-4, atol=2e-5, err_msg=f"block{i}/{k}")
