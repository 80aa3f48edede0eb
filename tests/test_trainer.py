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
    def test_structural_freeze_matches_masked_step(self):
        """make_train_step(masa_frozen=True) — the trace-time-pruned masa
        backward used by the CLI during the param_fix_iterations phase —
        must produce the same updated params as the grad-masking path up
        to f32 rounding (pruning the masa backward changes XLA fusion of
        the shared trunk backward) and zero masa movement."""
        m = tiny_model()
        lq = jax.random.normal(KEY, (2, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        params = m.init(KEY, lq, ref)["params"]
        sched = cosine_annealing_restart_cyclic_lr(
            1e-3, [100, 100], [1, 1], [1e-3, 1e-6])
        tx = build_optimizer(params, sched, sched, grad_clip=0.01,
                             param_fix_iterations=2)
        state = create_train_state(params, tx)
        batch = {"lq": lq, "ref": ref, "gt": lq * 0.9}
        step = make_train_step(m.apply, l1_loss, tx, donate=False)
        frozen = make_train_step(m.apply, l1_loss, tx, donate=False,
                                 masa_frozen=True)
        sa, ma = step(state, batch)
        sb, mb = frozen(state, batch)
        pa, pb = tu.flatten_dict(sa.params), tu.flatten_dict(sb.params)
        for k in pa:
            np.testing.assert_allclose(
                np.asarray(pa[k]), np.asarray(pb[k]), atol=2e-6,
                err_msg="/".join(k))
        assert np.isclose(float(ma["l_pix"]), float(mb["l_pix"]))


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

    def test_net_g_artifact_contains_both_trees(self, tmp_path):
        """net_g_<iter> must hold params AND params_ema (reference
        base_model.py:431-435 save with param_key=['params','params_ema'])."""
        from textualdegremoval_tpu.train.checkpoint import CheckpointManager

        m, state, step, batch = setup()
        s1, _ = step(state, batch)
        ckpt = CheckpointManager(str(tmp_path))
        ckpt.save_network(jax.device_get(s1.params),
                          jax.device_get(s1.ema_params), 1)
        got_p = ckpt.load_network(jax.device_get(s1.params), 1, ema=False)
        got_e = ckpt.load_network(jax.device_get(s1.params), 1, ema=True)
        fp = tu.flatten_dict(jax.device_get(s1.params))
        fe = tu.flatten_dict(jax.device_get(s1.ema_params))
        gp = tu.flatten_dict(got_p)
        ge = tu.flatten_dict(got_e)
        k = next(k for k in fp if k[-1] == "kernel")
        np.testing.assert_array_equal(gp[k], fp[k])
        np.testing.assert_array_equal(ge[k], fe[k])
        # after one 0.999-EMA step the two trees genuinely differ
        assert not np.array_equal(gp[k], ge[k])

    def test_ema_off_aliases_params(self):
        # reference base_model.py:108-126: ema_decay default 0 = EMA off;
        # the ema tree must then track params exactly (weight copy), so
        # eval/save paths behave as if no EMA existed
        m, state, step, batch = setup()
        tx = build_optimizer(state.params,
                             cosine_annealing_restart_cyclic_lr(
                                 1e-3, [100, 100], [1, 1], [1e-3, 1e-6]))
        step0 = make_train_step(m.apply, l1_loss, tx, ema_decay=0,
                                donate=False)
        s1, _ = step0(state, batch)
        e = tu.flatten_dict(s1.ema_params)
        p = tu.flatten_dict(s1.params)
        for k in p:
            np.testing.assert_array_equal(np.asarray(e[k]), np.asarray(p[k]))

    def test_validation_uses_ema_params_when_enabled(self):
        """VERDICT r2 item 3: val must run the EMA net when ema_decay > 0
        (reference image_restoration_ref_model.py:303)."""
        from textualdegremoval_tpu.cli.train_restoration import validate
        import logging

        m, state, _, batch = setup()
        # make ema params wildly different from live params
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        state = state.replace(ema_params=zeros)

        class Writer:
            def __init__(self):
                self.scalars = {}

            def write(self, step, d):
                self.scalars.update(d)

        gt = np.asarray(batch["gt"])
        loader = [{"lq": np.asarray(batch["lq"])[:1], "gt": gt[:1],
                   "ref": np.asarray(batch["ref"])[:1]}]
        opt = {"val": {"max_minibatch": 1}, "scale": 1}
        log = logging.getLogger("test")
        w_live, w_ema = Writer(), Writer()
        validate(m, state, loader, opt, log, w_live, 1, use_ema=False)
        validate(m, state, loader, opt, log, w_ema, 1, use_ema=True)
        # the two nets are different, so the metric must differ — and the
        # ema run must equal a direct forward with the ema tree
        assert w_live.scalars["val/psnr"] != w_ema.scalars["val/psnr"]
        from textualdegremoval_tpu.metrics import calculate_psnr
        pred = np.clip(np.asarray(m.apply(
            {"params": zeros}, batch["lq"][:1], batch["ref"][:1]))[0], 0, 1)
        want = calculate_psnr(pred * 255, gt[0] * 255, crop_border=0)
        np.testing.assert_allclose(w_ema.scalars["val/psnr"], want, rtol=1e-6)

    def test_validation_pad_test_window(self):
        """pad_test protocol: odd-size lq reflect-padded to the window
        multiple, output cropped back to the original size (reference
        :286-298)."""
        from textualdegremoval_tpu.cli.train_restoration import validate
        import logging

        m, state, _, _ = setup()
        lq = np.asarray(jax.random.normal(KEY, (1, 37, 41, 3)), np.float32)
        ref = np.asarray(jax.random.normal(KEY, (1, 32, 32, 3)), np.float32)
        gt = lq * 0.9

        class Writer:
            def __init__(self):
                self.scalars = {}

            def write(self, step, d):
                self.scalars.update(d)

        w = Writer()
        opt = {"val": {"window_size": 16}, "scale": 1}
        validate(m, state, [{"lq": lq, "gt": gt, "ref": ref}], opt,
                 logging.getLogger("t"), w, 1, use_ema=False)
        # must produce a finite metric at the ORIGINAL (unpadded) size:
        # psnr compares pred (cropped back to 37x41) against gt
        assert np.isfinite(w.scalars["val/psnr"])
        # oracle: forward on the padded input, cropped
        pad = np.pad(lq, ((0, 0), (0, 11), (0, 7), (0, 0)), "reflect")
        out = np.asarray(m.apply({"params": state.ema_params}, pad, ref))
        pred = np.clip(out[:, :37, :41][0], 0, 1)
        from textualdegremoval_tpu.metrics import calculate_psnr
        want = calculate_psnr(pred * 255, gt[0] * 255, crop_border=0)
        np.testing.assert_allclose(w.scalars["val/psnr"], want, rtol=1e-6)


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
