"""Fused-GDFN kernel coverage (ADVICE r2): gdfn_ref vs the nn.Conv module
path, and the Pallas kernel in interpret mode vs gdfn_ref."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.models.layers import GDFN
from textualdegremoval_tpu.ops.pallas.gdfn import _gdfn_fused_impl, gdfn_ref

KEY = jax.random.PRNGKey(0)


def _weights(c, hidden, key):
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (c, 2 * hidden)) * 0.2
    dwk = jax.random.normal(k2, (3, 3, 2 * hidden)) * 0.2
    w2 = jax.random.normal(k3, (hidden, c)) * 0.2
    return w1, dwk, w2


class TestGdfnRefVsModule:
    @pytest.mark.parametrize("c,hw", [(16, 12), (48, 8)])
    def test_matches_conv_module_path(self, c, hw):
        """Same params through the nn.Conv op chain and through gdfn_ref
        (fused=True falls back to gdfn_ref off-TPU) — identical math."""
        x = jax.random.normal(KEY, (2, hw, hw, c))
        mod = GDFN(dim=c, ffn_expansion_factor=2.66, use_bias=False,
                   fused=False)
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        want = mod.apply({"params": params}, x)
        fused_mod = GDFN(dim=c, ffn_expansion_factor=2.66, use_bias=False,
                         fused=True)
        got = fused_mod.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_ref_direct_vs_module(self):
        c, hw = 16, 10
        hidden = int(c * 2.66)
        x = jax.random.normal(KEY, (1, hw, hw, c))
        mod = GDFN(dim=c, use_bias=False, fused=False)
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        w1 = params["project_in"]["kernel"].reshape(c, 2 * hidden)
        dwk = params["dwconv"]["kernel"].reshape(3, 3, 2 * hidden)
        w2 = params["project_out"]["kernel"].reshape(hidden, c)
        want = mod.apply({"params": params}, x)
        got = gdfn_ref(x, w1, dwk, w2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


class TestGdfnPallasInterpret:
    @pytest.mark.parametrize("c,h,w", [(16, 8, 8), (48, 16, 8)])
    def test_kernel_matches_ref(self, c, h, w):
        hidden = int(c * 2.66)
        x = jax.random.normal(KEY, (1, h, w, c))
        w1, dwk, w2 = _weights(c, hidden, jax.random.PRNGKey(2))
        want = gdfn_ref(x, w1, dwk, w2)
        got = _gdfn_fused_impl(x, w1, dwk, w2, interpret=True)
        # erf approximation (A&S 7.1.26) bounds the gate to ~1.5e-7 abs;
        # downstream matmul scales that by ~sqrt(hidden)*|w2|
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-5)

    def test_multi_tile_halo_rows(self):
        """H spanning several row tiles: the 1-row sliver halo blocks and
        edge zeroing must reproduce conv zero-padding."""
        c = 16
        hidden = int(c * 2.66)
        h, w = 32, 8  # t=8 -> 4 row tiles
        x = jax.random.normal(KEY, (2, h, w, c))
        w1, dwk, w2 = _weights(c, hidden, jax.random.PRNGKey(3))
        want = gdfn_ref(x, w1, dwk, w2)
        got = _gdfn_fused_impl(x, w1, dwk, w2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-5)

    def test_bf16_io(self):
        c, h, w = 16, 8, 8
        hidden = int(c * 2.66)
        x = jax.random.normal(KEY, (1, h, w, c)).astype(jnp.bfloat16)
        w1, dwk, w2 = _weights(c, hidden, jax.random.PRNGKey(4))
        want = gdfn_ref(x, w1, dwk, w2)
        got = _gdfn_fused_impl(x, w1, dwk, w2, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=3e-2, rtol=3e-2)

    def test_gradients_through_custom_vjp(self, monkeypatch):
        """jax.grad through gdfn_fused (kernel forward in interpret mode,
        backward recomputed through gdfn_ref) matches jax.grad of
        gdfn_ref."""
        from textualdegremoval_tpu.ops.pallas import gdfn as gdfn_mod

        monkeypatch.setattr(gdfn_mod, "_INTERPRET", True)
        c, h, w = 16, 8, 8
        hidden = int(c * 2.66)
        x = jax.random.normal(KEY, (1, h, w, c))
        w1, dwk, w2 = _weights(c, hidden, jax.random.PRNGKey(5))

        g_ref = jax.grad(lambda *a: jnp.sum(gdfn_ref(*a) ** 2),
                         argnums=(0, 1, 2, 3))(x, w1, dwk, w2)
        g_fused = jax.grad(
            lambda *a: jnp.sum(gdfn_mod.gdfn_fused(*a) ** 2),
            argnums=(0, 1, 2, 3))(x, w1, dwk, w2)
        # forward values differ only by the erf approximation; the cotangent
        # feeding the (identical) vjp inherits that small difference
        for a, b in zip(g_ref, g_fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-4)
