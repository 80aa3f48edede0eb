"""Spatial (sp) sharding: the dp x sp sharded forward must equal the
unsharded forward exactly — GSPMD inserts halo exchanges for the convs and
collectives for the MASA gathers."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from textualdegremoval_tpu.models.restormer import RestormerRefFusion

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_sp_sharded_forward_matches_unsharded():
    m = RestormerRefFusion(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
    lq = jax.random.normal(KEY, (2, 64, 64, 3))
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    params = m.init(KEY, lq[:1], ref[:1])

    want = np.asarray(jax.jit(m.apply)(params, lq, ref))

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "sp"))
    with mesh:
        sh = NamedSharding(mesh, P("dp", "sp"))
        lq_s = jax.device_put(lq, sh)
        ref_s = jax.device_put(ref, sh)
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        got = jax.jit(m.apply)(params_s, lq_s, ref_s)
        jax.block_until_ready(got)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
