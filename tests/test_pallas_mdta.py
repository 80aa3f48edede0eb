"""Pallas MDTA kernel vs the pure-JAX reference op (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.ops.attention import mdta_attention_nhwc
from textualdegremoval_tpu.ops.pallas import mdta_attention_pallas

KEY = jax.random.PRNGKey(0)


class TestPallasMDTA:
    @pytest.mark.parametrize("heads,c,hw", [(1, 48, 16), (2, 96, 16),
                                            (4, 128, 8)])
    def test_matches_reference_op(self, heads, c, hw):
        q = jax.random.normal(KEY, (2, hw, hw, c))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, c))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, hw, hw, c))
        temp = jax.random.normal(jax.random.PRNGKey(3), (heads, 1, 1)) + 1.0

        want = mdta_attention_nhwc(q, k, v, temp, heads)
        got = mdta_attention_pallas(q, k, v, temp, heads, tile_l=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_padding_of_l(self):
        """L not divisible by the tile: zero padding must not change stats."""
        q = jax.random.normal(KEY, (1, 6, 6, 48))  # L=36, tile 32
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 48))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 6, 48))
        temp = jnp.ones((1, 1, 1))
        want = mdta_attention_nhwc(q, k, v, temp, 1)
        got = mdta_attention_pallas(q, k, v, temp, 1, tile_l=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
