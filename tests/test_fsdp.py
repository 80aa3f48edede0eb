"""FSDP param sharding: sharded train step must match the replicated step
numerically, with params actually distributed."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from textualdegremoval_tpu.parallel.fsdp import (
    fsdp_spec, shard_params_fsdp,
)
from textualdegremoval_tpu.parallel import make_mesh, shard_batch, replicate
from textualdegremoval_tpu.models.restormer import RestormerRefFusion
from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state, make_train_step,
)
from textualdegremoval_tpu.losses import l1_loss

KEY = jax.random.PRNGKey(0)


class TestFsdpSpec:
    def test_largest_divisible_dim(self):
        assert fsdp_spec((3, 3, 16, 32), 8) == P(None, None, None, "dp")
        assert fsdp_spec((48,), 8) == P("dp")
        assert fsdp_spec((7, 9), 8) == P()
        assert fsdp_spec((), 8) == P()


class TestFsdpStep:
    @pytest.mark.slow
    def test_matches_replicated(self):
        mesh = make_mesh()
        m = RestormerRefFusion(
            dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
            reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
        lq = jax.random.normal(KEY, (8, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
        gt = lq * 0.9
        params = m.init(KEY, lq[:1], ref[:1])["params"]
        tx = build_optimizer(params, lambda s: 1e-3, grad_clip=0.01)
        step = make_train_step(m.apply, l1_loss, tx, donate=False)
        batch = {"lq": lq, "ref": ref, "gt": gt}

        with mesh:
            # replicated reference
            state_r = replicate(mesh, create_train_state(params, tx))
            _, metrics_r = step(state_r, shard_batch(mesh, batch))

            # fsdp-sharded params
            params_f = shard_params_fsdp(mesh, params)
            state_f = create_train_state(params_f, tx)
            new_state, metrics_f = step(state_f, shard_batch(mesh, batch))
            jax.block_until_ready(metrics_f["l_pix"])

        np.testing.assert_allclose(float(metrics_f["l_pix"]),
                                   float(metrics_r["l_pix"]), rtol=1e-5)
        # at least one large leaf is actually sharded across devices
        leaves = jax.tree_util.tree_leaves(new_state.params)
        assert any(
            not l.sharding.is_fully_replicated for l in leaves
        )
