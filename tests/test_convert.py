"""Checkpoint-conversion parity: torch oracle weights -> Flax, outputs must
match bit-close in f32.  This is the lossless-conversion gate required by
BASELINE.json."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from textualdegremoval_tpu.convert import convert_state_dict
from textualdegremoval_tpu.convert.torch_to_jax import verify_against_init
from textualdegremoval_tpu.models.restormer import Restormer, RestormerRefFusion
from textualdegremoval_tpu.models.nafnet import NAFNet

from torch_oracles import ORestormer, ONAFNet, ORestormerRefFusion

KEY = jax.random.PRNGKey(0)


def randomize(torch_model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in torch_model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return torch_model


@pytest.mark.slow
class TestRestormerConversion:
    def test_forward_parity(self):
        tm = randomize(ORestormer(dim=8, num_blocks=(1, 1, 1, 1),
                                  num_refinement_blocks=1, heads=(1, 1, 2, 2)))
        tm.eval()
        x = torch.randn(1, 3, 32, 32, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = Restormer(dim=8, num_blocks=(1, 1, 1, 1),
                       num_refinement_blocks=1, heads=(1, 1, 2, 2))
        params = {"params": convert_state_dict(tm.state_dict())}
        init = fm.init(KEY, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert verify_against_init(params["params"], init["params"]) == []

        got = fm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )


class TestNAFNetConversion:
    def test_forward_parity(self):
        tm = randomize(ONAFNet(width=8, enc_blk_nums=(1, 1), dec_blk_nums=(1, 1)))
        tm.eval()
        x = torch.randn(1, 3, 16, 16, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                    dec_blk_nums=(1, 1))
        params = {"params": convert_state_dict(tm.state_dict())}
        init = fm.init(KEY, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        assert verify_against_init(params["params"], init["params"]) == []

        got = fm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4
        )


class TestRefFusionConversion:
    @pytest.mark.slow
    def test_forward_parity(self):
        kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                  heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
                  reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
        tm = randomize(ORestormerRefFusion(**{k: v for k, v in kw.items()}))
        tm.eval()
        g = torch.Generator().manual_seed(3)
        lq = torch.randn(1, 3, 32, 32, generator=g)
        ref = torch.randn(1, 3, 32, 32, generator=g)
        with torch.no_grad():
            want = tm(lq, ref).numpy()

        fm = RestormerRefFusion(**kw)
        params = {"params": convert_state_dict(tm.state_dict())}
        lq_j = jnp.asarray(lq.numpy().transpose(0, 2, 3, 1))
        ref_j = jnp.asarray(ref.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, lq_j, ref_j)
        assert verify_against_init(params["params"], init["params"]) == []

        got = fm.apply(params, lq_j, ref_j)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4
        )


class TestNAFNetRefFusionConversion:
    @pytest.mark.slow  # 46 s compile on CPU (fast-suite budget, round 4)
    def test_forward_parity(self):
        from textualdegremoval_tpu.models.nafnet import NAFNetRefFusion
        from torch_oracles import ONAFNetRefFusion

        kw = dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 1),
                  dec_blk_nums=(1, 1, 1, 1), nf=8, ext_n_blocks=(1, 1, 1, 1),
                  reffusion_n_blocks=(1, 1, 1, 1),
                  reffusion_n_blocks_middle=1, lr_block_size=4)
        tm = randomize(ONAFNetRefFusion(**kw), seed=5)
        tm.eval()
        g = torch.Generator().manual_seed(6)
        lq = torch.randn(1, 3, 64, 64, generator=g)
        ref = torch.randn(1, 3, 64, 64, generator=g)
        with torch.no_grad():
            want = tm(lq, ref).numpy()

        fm = NAFNetRefFusion(**kw)
        params = {"params": convert_state_dict(tm.state_dict())}
        lq_j = jnp.asarray(lq.numpy().transpose(0, 2, 3, 1))
        ref_j = jnp.asarray(ref.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, lq_j, ref_j)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, lq_j, ref_j)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4
        )


class TestDRSformerConversion:
    @pytest.mark.slow  # 44 s compile on CPU (fast-suite budget, round 4)
    def test_forward_parity_no_mefc(self):
        from textualdegremoval_tpu.models.drsformer import DRSformer
        from torch_oracles import ODRSformer

        tm = randomize(ODRSformer(dim=8, num_blocks=(1, 1, 1, 1),
                                  heads=(1, 1, 2, 2)), seed=11)
        tm.eval()
        x = torch.randn(1, 3, 32, 32,
                        generator=torch.Generator().manual_seed(12))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = DRSformer(dim=8, num_blocks=(1, 1, 1, 1), heads=(1, 1, 2, 2),
                       use_mefc=False)
        params = {"params": convert_state_dict(tm.state_dict())}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, xj)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, xj)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


class TestConvTransposeConversion:
    def test_sfnet_up_conv_key_converts_with_flip(self):
        import torch.nn as nn

        tconv = nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1)
        randomize(tconv, seed=13)
        sd = {"feat_extract.3.conv.weight": tconv.weight,
              "feat_extract.3.conv.bias": tconv.bias}
        tree = convert_state_dict(sd)
        import flax.linen as fnn

        m = fnn.ConvTranspose(6, (4, 4), strides=(2, 2),
                              padding=((2, 2), (2, 2)))
        x = torch.randn(1, 4, 8, 8, generator=torch.Generator().manual_seed(14))
        want = tconv(x).detach().numpy().transpose(0, 2, 3, 1)
        got = m.apply(
            {"params": {"kernel": tree["feat_extract_3"]["conv"]["kernel"],
                        "bias": tree["feat_extract_3"]["conv"]["bias"]}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.slow
class TestPromptIRConversion:
    def test_forward_parity_with_prompts(self):
        from textualdegremoval_tpu.models.promptir import PromptIR
        from torch_oracles import OPromptIR

        tm = randomize(OPromptIR(dim=48, num_blocks=(1, 1, 1, 1),
                                 num_refinement_blocks=1,
                                 heads=(1, 1, 2, 2)), seed=15)
        tm.eval()
        x = torch.randn(1, 3, 32, 32,
                        generator=torch.Generator().manual_seed(16))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = PromptIR(dim=48, num_blocks=(1, 1, 1, 1),
                      num_refinement_blocks=1, heads=(1, 1, 2, 2),
                      decoder=True)
        params = {"params": convert_state_dict(tm.state_dict())}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, xj)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, xj)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


class TestSFNetBlockConversion:
    def test_sfres_block_with_filters(self):
        """SFNet's frequency-selection math (Gap/PatchAP/SFconv/dynamic
        filter incl. BatchNorm) converts numerically."""
        from textualdegremoval_tpu.models.sfnet import SFResBlock
        from torch_oracles import OSFResBlock

        ch = 16
        tm = OSFResBlock(ch, use_filter=True)
        randomize(tm, seed=17)
        tm.eval()
        x = torch.randn(1, ch, 16, 16,
                        generator=torch.Generator().manual_seed(18))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = SFResBlock(ch, use_filter=True, use_running_average=True)
        sd = convert_state_dict(tm.state_dict())
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        variables = fm.init(KEY, xj)
        # BatchNorm: split converted tree into params vs batch_stats
        import flax.traverse_util as tu
        flat = tu.flatten_dict(sd)
        params, stats = {}, {}
        for k, v in flat.items():
            if k[-1] in ("running_mean", "running_var"):
                newk = k[:-1] + ("mean" if k[-1] == "running_mean" else "var",)
                stats[newk] = v
            elif k[-1] == "num_batches_tracked":
                continue
            else:
                params[k] = v
        tree = {"params": tu.unflatten_dict(params),
                "batch_stats": tu.unflatten_dict(stats)}
        assert verify_against_init(tree["params"], variables["params"]) == []

        got = fm.apply(tree, xj)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


class TestNAFNetDynamicConversion:
    def test_forward_parity(self):
        from textualdegremoval_tpu.models.nafnet_dynamic import (
            NAFNetDynamicFusion,
        )
        from torch_oracles import ONAFNetDynamic

        tm = randomize(ONAFNetDynamic(width=8, middle_blk_num=1,
                                      enc_blk_nums=(1, 1),
                                      dec_blk_nums=(1, 1)), seed=19)
        tm.eval()
        g = torch.Generator().manual_seed(20)
        x = torch.randn(1, 3, 16, 16, generator=g)
        k_v = torch.randn(1, 10, 1024, generator=g)
        with torch.no_grad():
            want = tm(x, k_v).numpy()

        fm = NAFNetDynamicFusion(width=8, middle_blk_num=1,
                                 enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        params = {"params": convert_state_dict(tm.state_dict())}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        kj = jnp.asarray(k_v.numpy())
        init = fm.init(KEY, xj, kj)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, xj, kj)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


@pytest.mark.slow
class TestSFNetFullConversion:
    def test_full_net_forward_parity(self):
        from textualdegremoval_tpu.models.sfnet import SFNetRefFusion
        from torch_oracles import OSFNetRefFusion

        kw = dict(num_res=1, base_channel=8, nf=8, ext_n_blocks=(1, 1, 1),
                  reffusion_n_blocks=(1, 1, 1), lr_block_size=4)
        tm = OSFNetRefFusion(**kw)
        randomize(tm, seed=21)
        tm.eval()
        g = torch.Generator().manual_seed(22)
        lq = torch.randn(1, 3, 32, 32, generator=g)
        ref = torch.randn(1, 3, 32, 32, generator=g)
        with torch.no_grad():
            want = [o.numpy() for o in tm(lq, ref)]

        fm = SFNetRefFusion(**kw, use_running_average=True)
        sd = convert_state_dict(tm.state_dict())
        import flax.traverse_util as tu
        flat = tu.flatten_dict(sd)
        params, stats = {}, {}
        for k, v in flat.items():
            if k[-1] in ("running_mean", "running_var"):
                stats[k[:-1] + ("mean" if k[-1] == "running_mean"
                                else "var",)] = v
            elif k[-1] == "num_batches_tracked":
                continue
            else:
                params[k] = v
        tree = {"params": tu.unflatten_dict(params),
                "batch_stats": tu.unflatten_dict(stats)}
        lq_j = jnp.asarray(lq.numpy().transpose(0, 2, 3, 1))
        ref_j = jnp.asarray(ref.numpy().transpose(0, 2, 3, 1))
        variables = fm.init(KEY, lq_j, ref_j)
        assert verify_against_init(tree["params"], variables["params"]) == []

        got = fm.apply(tree, lq_j, ref_j)
        for g_l, w_l in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g_l).transpose(0, 3, 1, 2), w_l, atol=3e-4)
