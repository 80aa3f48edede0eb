"""GDFN-half backward kernel parity (ops/pallas/tblock_bwd.py).

gdfn_half_bwd must reproduce jax.vjp of tblock._tblock_gdfn_part — dx1 and
every weight gradient — in f32 interpret mode, including edge tiles,
multi-tile grids, batch > 1, and both LN types.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textualdegremoval_tpu.ops.pallas.tblock import _tblock_gdfn_part
from textualdegremoval_tpu.ops.pallas.tblock_bwd import gdfn_half_bwd

from test_pallas_tblock import _extract, _setup


def _ref_bwd(x1, dout, p, ln_type):
    _, vjp = jax.vjp(lambda xx, pp: _tblock_gdfn_part(xx, pp, ln_type),
                     x1, p)
    dx1, dp = vjp(dout)
    return dx1, dp


@pytest.mark.parametrize("shape,t", [
    ((1, 8, 16, 8), 8),    # single tile: both edge masks in one step
    ((1, 16, 16, 8), 8),   # two tiles
    ((2, 24, 16, 16), 4),  # batch 2, middle tiles
])
@pytest.mark.parametrize("ln_type", ["WithBias", "BiasFree"])
def test_interpret_matches_vjp(shape, t, ln_type, monkeypatch):
    import textualdegremoval_tpu.ops.pallas.tblock as tb
    monkeypatch.setattr(tb, "_INTERPRET", True)

    x, _, params = _setup(*shape, ln_type=ln_type, seed=shape[1])
    p = _extract(params)
    x1 = x + 0.3 * jax.random.normal(jax.random.PRNGKey(9), x.shape)
    dout = jax.random.normal(jax.random.PRNGKey(10), x.shape)

    want_dx1, want_dp = _ref_bwd(x1, dout, p, ln_type)
    got_dx1, got_dp = gdfn_half_bwd(x1, dout, p, ln_type, t)

    np.testing.assert_allclose(np.asarray(got_dx1), np.asarray(want_dx1),
                               rtol=2e-4, atol=2e-5)
    for k in ("gd_in", "gd_dw", "gd_out", "norm2_w") + (
            ("norm2_b",) if ln_type != "BiasFree" else ()):
        np.testing.assert_allclose(
            np.asarray(got_dp[k]), np.asarray(want_dp[k]),
            rtol=2e-4, atol=2e-4, err_msg=k)
