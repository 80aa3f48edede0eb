"""Shape/jit/grad smoke tests for the backbones (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textualdegremoval_tpu.models import define_network
from textualdegremoval_tpu.models.restormer import Restormer, RestormerRefFusion
from textualdegremoval_tpu.models.nafnet import NAFNet, NAFNetRefFusion

KEY = jax.random.PRNGKey(0)


def tiny_restormer(**kw):
    return Restormer(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                     heads=(1, 1, 2, 2), **kw)


def tiny_restormer_ref(**kw):
    return RestormerRefFusion(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4, **kw)


def tiny_nafnet(**kw):
    return NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 1),
                  dec_blk_nums=(1, 1, 1, 1), **kw)


def tiny_nafnet_ref(**kw):
    return NAFNetRefFusion(
        width=8, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 1),
        dec_blk_nums=(1, 1, 1, 1), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4, **kw)


class TestPlainBackbones:
    def test_restormer_shape_and_residual(self):
        m = tiny_restormer()
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        params = m.init(KEY, x)
        y = jax.jit(m.apply)(params, x)
        assert y.shape == x.shape
        assert not np.allclose(np.asarray(y), 0)

    def test_restormer_pads_odd_sizes(self):
        m = tiny_restormer()
        x = jax.random.normal(KEY, (1, 30, 35, 3))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == x.shape

    def test_nafnet_shape(self):
        m = tiny_nafnet()
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        params = m.init(KEY, x)
        y = jax.jit(m.apply)(params, x)
        assert y.shape == x.shape

    def test_nafnet_tlc_variant(self):
        m = tiny_nafnet(tlc_train_size=(32, 32))
        x = jax.random.normal(KEY, (1, 48, 48, 3))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == x.shape


class TestRefFusion:
    @pytest.mark.slow  # 141 s compile under load (fast-suite budget, r5)
    def test_restormer_ref_fusion(self):
        m = tiny_restormer_ref()
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref)
        y = jax.jit(m.apply)(params, lq, ref)
        assert y.shape == lq.shape

    @pytest.mark.slow  # 176 s compile under load (fast-suite budget, r5)
    def test_nafnet_ref_fusion(self):
        m = tiny_nafnet_ref()
        lq = jax.random.normal(KEY, (1, 64, 64, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        params = m.init(KEY, lq, ref)
        y = jax.jit(m.apply)(params, lq, ref)
        assert y.shape == lq.shape

    def test_zero_init_gates_make_fusion_identity_at_init(self):
        """At init, alpha gates are zero: RefFusion output must not depend on
        the ref image through the fusion path's gated component."""
        m = tiny_restormer_ref()
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref1 = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        ref2 = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref1)
        y1 = m.apply(params, lq, ref1)
        y2 = m.apply(params, lq, ref2)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    @pytest.mark.slow
    def test_grads_flow(self):
        import flax.traverse_util as tu

        m = tiny_restormer_ref()
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref)
        # Zero-init alpha gates block all gradient into the MASA path at
        # init (by design); open them to verify gradient connectivity.
        flat = tu.flatten_dict(params["params"])
        for k in flat:
            if k[-1] == "alpha":
                flat[k] = jnp.ones_like(flat[k])
        params = {"params": tu.unflatten_dict(flat)}

        def loss(p):
            return jnp.mean(jnp.abs(m.apply(p, lq, ref)))

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        gflat = tu.flatten_dict(g["params"])
        masa_keys = [k for k in gflat if "masa_enc" in "/".join(k)]
        assert masa_keys
        assert any(float(jnp.abs(gflat[k]).max()) > 0 for k in masa_keys)


class TestRegistry:
    def test_define_network_restormer(self):
        opt = {
            "type": "RestormerRefFusion",
            "inp_channels": 3, "out_channels": 3, "dim": 8,
            "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
            "heads": [1, 1, 2, 2], "ffn_expansion_factor": 2.66,
            "bias": False, "LayerNorm_type": "WithBias",
            "dual_pixel_task": False, "nf": 8, "ext_n_blocks": [1, 1, 1, 1],
            "reffusion_n_blocks": [1, 1, 1, 1], "reffusion_n_blocks_middle": 1,
            "scale": 1, "num_nbr": 1, "psize": 3, "lr_block_size": 4,
            "ref_down_block_size": 1.5, "dilations": [1, 2, 3],
        }
        m = define_network(opt)
        assert isinstance(m, RestormerRefFusion)
        assert m.ln_type == "WithBias"
        assert m.lr_block_size == 4

    def test_define_network_nafnet(self):
        opt = {"type": "NAFNetRefFusion", "img_channel": 3, "width": 8,
               "middle_blk_num": 1, "enc_blk_nums": [1, 1, 1, 1],
               "dec_blk_nums": [1, 1, 1, 1], "nf": 8,
               "ext_n_blocks": [1, 1, 1, 1], "reffusion_n_blocks": [1, 1, 1, 1],
               "lr_block_size": 4}
        m = define_network(opt)
        assert isinstance(m, NAFNetRefFusion)


class TestDualPixelAndOddSizes:
    @pytest.mark.slow
    def test_ref_fusion_odd_size_pads(self):
        m = tiny_restormer_ref()
        lq = jax.random.normal(KEY, (1, 50, 70, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 50, 70, 3))
        params = m.init(KEY, lq, ref)
        y = m.apply(params, lq, ref)
        assert y.shape == lq.shape

    def test_restormer_dual_pixel(self):
        m = tiny_restormer(inp_channels=6, dual_pixel_task=True)
        x = jax.random.normal(KEY, (1, 32, 32, 6))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == (1, 32, 32, 3)

    def test_ref_fusion_dual_pixel(self):
        m = tiny_restormer_ref(inp_channels=6, dual_pixel_task=True)
        lq = jax.random.normal(KEY, (1, 32, 32, 6))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 6))
        params = m.init(KEY, lq, ref)
        y = m.apply(params, lq, ref)
        assert y.shape == (1, 32, 32, 3)
        import flax.traverse_util as tu
        flat = tu.flatten_dict(params["params"])
        assert any("skip_conv" in "/".join(k) for k in flat)
