"""Trainer tests: optimizer param-group split, masa freeze, train step on an
8-device dp mesh, EMA, grad clip."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.traverse_util as tu

from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state, make_train_step, _masa_mask,
)
from textualdegremoval_tpu.train.schedules import (
    cosine_annealing_restart_cyclic_lr,
)
from textualdegremoval_tpu.losses import l1_loss
from textualdegremoval_tpu.parallel import make_mesh, shard_batch, replicate
from textualdegremoval_tpu.models.restormer import RestormerRefFusion

KEY = jax.random.PRNGKey(0)


def tiny_model():
    return RestormerRefFusion(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)


def setup(fix_iters=0):
    m = tiny_model()
    lq = jax.random.normal(KEY, (2, 32, 32, 3))
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    gt = lq * 0.9
    params = m.init(KEY, lq, ref)["params"]
    sched = cosine_annealing_restart_cyclic_lr(
        1e-3, [100, 100], [1, 1], [1e-3, 1e-6])
    tx = build_optimizer(params, sched, sched, grad_clip=0.01,
                         param_fix_iterations=fix_iters)
    state = create_train_state(params, tx)
    step = make_train_step(m.apply, l1_loss, tx, donate=False)
    batch = {"lq": lq, "ref": ref, "gt": gt}
    return m, state, step, batch


class TestOptimizer:
    def test_masa_mask_identifies_groups(self):
        m = tiny_model()
        params = m.init(KEY, jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 32, 32, 3)))["params"]
        mask = tu.flatten_dict(_masa_mask(params))
        masa = [k for k, v in mask.items() if v]
        trunk = [k for k, v in mask.items() if not v]
        assert any("masa_enc" in "/".join(k) for k in masa)
        assert any("masa_blk" in "/".join(k) for k in masa)
        assert all("masa" not in "/".join(k).lower() for k in trunk)

    @pytest.mark.slow
    def test_masa_frozen_then_released(self):
        m, state, step, batch = setup(fix_iters=2)
        p0 = tu.flatten_dict(state.params)
        # open the alpha gates so masa receives gradient signal when live
        for k in p0:
            if k[-1] == "alpha":
                p0[k] = jnp.ones_like(p0[k])
        state = state.replace(params=tu.unflatten_dict(p0))
        p0 = tu.flatten_dict(state.params)

        s1, _ = step(state, batch)
        p1 = tu.flatten_dict(s1.params)
        masa_key = next(k for k in p1 if "masa_enc" in "/".join(k)
                        and k[-1] == "kernel")
        trunk_key = next(k for k in p1 if "encoder_level1_0" in "/".join(k)
                         and k[-1] == "kernel")
        # step 1 & 2: masa frozen, trunk moves
        np.testing.assert_array_equal(p1[masa_key], p0[masa_key])
        assert not np.allclose(p1[trunk_key], p0[trunk_key])
        s2, _ = step(s1, batch)
        p2 = tu.flatten_dict(s2.params)
        np.testing.assert_array_equal(p2[masa_key], p0[masa_key])
        # step 3: released
        s3, _ = step(s2, batch)
        p3 = tu.flatten_dict(s3.params)
        assert not np.allclose(p3[masa_key], p0[masa_key])


@pytest.mark.slow
class TestTrainStep:
    def test_loss_decreases(self):
        m, state, step, batch = setup()
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["l_pix"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_ema_tracks(self):
        m, state, step, batch = setup()
        s1, _ = step(state, batch)
        e = tu.flatten_dict(s1.ema_params)
        p = tu.flatten_dict(s1.params)
        p0 = tu.flatten_dict(state.params)
        k = next(k for k in p if k[-1] == "kernel")
        want = np.asarray(p0[k]) * 0.999 + np.asarray(p[k]) * 0.001
        np.testing.assert_allclose(np.asarray(e[k]), want, atol=1e-6)

    def test_grad_clip_applied(self):
        m, state, step, batch = setup()
        _, metrics = step(state, batch)
        assert float(metrics["grad_norm"]) > 0


@pytest.mark.slow
class TestMeshTrainStep:
    def test_dp8_step_runs_and_matches_single(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        m, state, step, batch = setup()
        batch8 = {k: jnp.tile(v, (4, 1, 1, 1)) for k, v in batch.items()}

        with mesh:
            sstate = replicate(mesh, state)
            sbatch = shard_batch(mesh, batch8)
            new_state, metrics = step(sstate, sbatch)
            jax.block_until_ready(metrics["l_pix"])
        assert np.isfinite(float(metrics["l_pix"]))

        # single-device equivalent on the same global batch
        _, metrics_single = step(state, batch8)
        np.testing.assert_allclose(
            float(metrics["l_pix"]), float(metrics_single["l_pix"]),
            rtol=1e-4,
        )
