"""Shape/jit smoke tests for DRSformer, PromptIR, SFNet, NAFNetDynamicFusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textualdegremoval_tpu.models.drsformer import DRSformer, DRSformerRefFusion
from textualdegremoval_tpu.models.promptir import PromptIR, PromptIRRefFusion
from textualdegremoval_tpu.models.sfnet import SFNet, SFNetRefFusion
from textualdegremoval_tpu.models.nafnet_dynamic import NAFNetDynamicFusion
from textualdegremoval_tpu.models import define_network

KEY = jax.random.PRNGKey(0)


class TestDRSformer:
    @pytest.mark.slow  # 100 s compile under load (fast-suite budget, r5)
    def test_plain(self):
        m = DRSformer(dim=8, num_blocks=(1, 1, 1, 1), heads=(1, 1, 2, 2),
                      use_mefc=True)
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        params = m.init(KEY, x)
        y = jax.jit(m.apply)(params, x)
        assert y.shape == x.shape

    def test_ref_fusion_no_mefc(self):
        m = DRSformerRefFusion(dim=8, num_blocks=(1, 1, 1, 1),
                               heads=(1, 1, 2, 2), use_mefc=False, nf=8,
                               ext_n_blocks=(1, 1, 1, 1),
                               reffusion_n_blocks=(1, 1, 1, 1),
                               lr_block_size=4)
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref)
        y = jax.jit(m.apply)(params, lq, ref)
        assert y.shape == lq.shape


class TestPromptIR:
    @pytest.mark.slow
    def test_plain_decoder(self):
        m = PromptIR(dim=48, num_blocks=(1, 1, 1, 1),
                     num_refinement_blocks=1, heads=(1, 1, 2, 2), decoder=True)
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        params = m.init(KEY, x)
        y = jax.jit(m.apply)(params, x)
        assert y.shape == x.shape

    @pytest.mark.slow
    def test_ref_fusion(self):
        m = PromptIRRefFusion(dim=48, num_blocks=(1, 1, 1, 1),
                              num_refinement_blocks=1, heads=(1, 1, 2, 2),
                              decoder=True, nf=48, ext_n_blocks=(1, 1, 1, 1),
                              reffusion_n_blocks=(1, 1, 1, 1),
                              lr_block_size=4)
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref)
        y = jax.jit(m.apply)(params, lq, ref)
        assert y.shape == lq.shape


class TestSFNet:
    @pytest.mark.slow
    def test_plain_multiscale_outputs(self):
        m = SFNet(num_res=2, base_channel=8)
        x = jax.random.normal(KEY, (1, 32, 32, 3))
        variables = m.init(KEY, x)
        outs = jax.jit(m.apply)(variables, x)
        assert outs[0].shape == (1, 8, 8, 3)
        assert outs[1].shape == (1, 16, 16, 3)
        assert outs[2].shape == (1, 32, 32, 3)

    @pytest.mark.slow  # 41 s compile on CPU (fast-suite budget, round 4)
    def test_tlc_variant(self):
        m = SFNet(num_res=2, base_channel=8, tlc_base=246)
        x = jax.random.normal(KEY, (1, 48, 48, 3))
        variables = m.init(KEY, x)
        outs = m.apply(variables, x)
        assert outs[2].shape == (1, 48, 48, 3)

    @pytest.mark.slow
    def test_ref_fusion(self):
        m = SFNetRefFusion(num_res=2, base_channel=8, nf=8,
                           ext_n_blocks=(1, 1, 1),
                           reffusion_n_blocks=(1, 1, 1), lr_block_size=4)
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        variables = m.init(KEY, lq, ref)
        outs = jax.jit(m.apply)(variables, lq, ref)
        assert outs[2].shape == lq.shape


class TestNAFNetDynamic:
    def test_forward(self):
        m = NAFNetDynamicFusion(width=8, middle_blk_num=1,
                                enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        x = jax.random.normal(KEY, (2, 16, 16, 3))
        k_v = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 1024))
        params = m.init(KEY, x, k_v)
        y = jax.jit(m.apply)(params, x, k_v)
        assert y.shape == x.shape

    def test_conditioning_matters(self):
        import flax.traverse_util as tu

        m = NAFNetDynamicFusion(width=8, middle_blk_num=1,
                                enc_blk_nums=(1,), dec_blk_nums=(1,))
        x = jax.random.normal(KEY, (1, 16, 16, 3))
        k1 = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 1024))
        k2 = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 1024))
        params = m.init(KEY, x, k1)
        # beta/gamma residual gates are zero at init (blocks are identity);
        # open them so the conditioning path is observable
        flat = tu.flatten_dict(params["params"])
        for k in flat:
            if k[-1] in ("beta", "gamma"):
                flat[k] = jnp.ones_like(flat[k])
        params = {"params": tu.unflatten_dict(flat)}
        y1 = m.apply(params, x, k1)
        y2 = m.apply(params, x, k2)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.slow
class TestMismatchedRefSize:
    """Whole-image eval feeds a full-size reference whose spatial size can
    differ from the lq (reference nonpad_test semantics): the MASA encoder
    must fall back to two shared-param passes (layers.masa_encode_pair)."""

    def test_nafnet_reffusion_ref_size_differs(self):
        from textualdegremoval_tpu.models.nafnet import NAFNetRefFusion

        m = NAFNetRefFusion(width=8, middle_blk_num=1,
                            enc_blk_nums=(1, 1, 1, 1),
                            dec_blk_nums=(1, 1, 1, 1), nf=8,
                            ext_n_blocks=(1, 1, 1, 1),
                            reffusion_n_blocks=(1, 1, 1, 1, 1),
                            lr_block_size=2)
        lq = jax.random.normal(KEY, (1, 40, 56, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
        params = m.init(KEY, lq, ref)
        y = jax.jit(m.apply)(params, lq, ref)
        assert y.shape == lq.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_restormer_equal_vs_pair_path_consistent(self):
        """The batched path (equal shapes) and the two-pass path must share
        parameters: cropping the ref to the lq shape changes values but the
        two-pass forward with an equal-size ref must equal the batched one."""
        from textualdegremoval_tpu.models.restormer import RestormerRefFusion
        from textualdegremoval_tpu.models import layers as L

        m = RestormerRefFusion(
            dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
            reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
        lq = jax.random.normal(KEY, (1, 32, 32, 3))
        ref = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        params = m.init(KEY, lq, ref)
        batched = np.asarray(m.apply(params, lq, ref))

        orig = L.masa_encode_pair

        def force_two_pass(enc, a, b):
            return enc(a), enc(b)

        L.masa_encode_pair = force_two_pass
        try:
            import textualdegremoval_tpu.models.restormer as R
            saved = R.masa_encode_pair
            R.masa_encode_pair = force_two_pass
            two_pass = np.asarray(m.apply(params, lq, ref))
            R.masa_encode_pair = saved
        finally:
            L.masa_encode_pair = orig
        np.testing.assert_allclose(batched, two_pass, atol=2e-5)


class TestRegistryExtra:
    @pytest.mark.parametrize("name", [
        "DRSformer", "DRSformerRefFusion", "PromptIR", "PromptIRRefFusion",
        "SFNet", "SFNetRefFusion", "NAFNetDynamicFusion",
        "DRSformer200L_SPA_RefFusion",
    ])
    def test_registered(self, name):
        from textualdegremoval_tpu.models import network_names
        assert name in network_names()
