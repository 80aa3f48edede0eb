"""Forward parity against the ACTUAL reference code at /root/reference.

Round-1 parity tests compared against hand-written re-implementations
(tests/torch_oracles.py); if oracle and port shared a misunderstanding both
would agree and both be wrong.  These tests close that gap: they import the
reference's own arch files (read-only, executed as data — no code is copied),
instantiate the networks with random weights at FULL-SIZE configs (the real
channel widths and block counts from options/train_restoration/*.yml),
convert the state dicts with our converter, and assert forward parity.

Where the repo deliberately diverges from the reference (the shipped defects
cataloged in SURVEY.md §2.5), the *divergence itself* is asserted: the
reference forward must fail exactly the way §2.5 documents, and ours must
run.

Needs no downloaded assets: weights are random, inputs are random.
"""

import importlib.util
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from textualdegremoval_tpu.convert import convert_state_dict
from textualdegremoval_tpu.convert.torch_to_jax import (
    split_batch_stats,
    verify_against_init,
)

REF_ROOT = "/root/reference"
KEY = jax.random.PRNGKey(0)

slow = pytest.mark.slow


# ---------------------------------------------------------------------------
# loading the reference arch files without their registry __init__s
# ---------------------------------------------------------------------------


def _ensure_pkg(name: str, path: str) -> None:
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        pkg.__package__ = name
        sys.modules[name] = pkg


def load_ref_arch(stem: str):
    """Import /root/reference/models/archs/<stem>.py directly.

    Stub ``models`` / ``models.archs`` packages provide the import path the
    reference files expect (``from models.archs.x import ...``) without
    executing the reference's registry __init__s, which import the entire
    model zoo (diffusers is not installed here)."""
    _ensure_pkg("models", f"{REF_ROOT}/models")
    _ensure_pkg("models.archs", f"{REF_ROOT}/models/archs")
    full = f"models.archs.{stem}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, f"{REF_ROOT}/models/archs/{stem}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def randomize(torch_model, seed=0, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in torch_model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return torch_model


def to_nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))


def from_nhwc(a) -> np.ndarray:
    return np.asarray(a).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# MASA ops vs the reference's own search/transfer methods
# ---------------------------------------------------------------------------


class TestMASAOpsVsReference:
    """Op-level oracle: the reference NAFNetRefFusion's bis/search_org/search/
    transfer methods (network_nafnet_guided_arch.py:483-574) run directly on
    random tensors vs our ops/masa.py kernels."""

    @pytest.fixture(scope="class")
    def ref_masa(self):
        mod = load_ref_arch("network_nafnet_guided_arch")
        # NB: the reference reads reffusion_n_blocks[len(enc)] for the middle
        # fusion (network_nafnet_guided_arch.py:463-465), so it needs a
        # 5-entry list — the shipped configs' 4-entry lists IndexError at
        # construction (same §2.5 defect family; our model takes the
        # evidently intended reffusion_n_blocks_middle knob instead).
        m = mod.NAFNetRefFusion(
            width=8, middle_blk_num=1, enc_blk_nums=[1, 1, 1, 1],
            dec_blk_nums=[1, 1, 1, 1], nf=8, ext_n_blocks=[1, 1, 1, 1],
            reffusion_n_blocks=[1, 1, 1, 1, 1], reffusion_n_blocks_middle=1,
            lr_block_size=4,
        )
        m.eval()
        return m

    def test_coarse_search(self, ref_masa):
        from textualdegremoval_tpu.ops.masa import masa_coarse_search

        g = torch.Generator().manual_seed(100)
        n, pb, c, ky, kx = 2, 4, 8, 10, 10
        hr, wr = 16, 16
        lr = torch.randn(n, pb, c, ky, kx, generator=g)
        reflr = torch.randn(n, c, hr, wr, generator=g)
        with torch.no_grad():
            corr, ind = ref_masa.search(
                lr, reflr, ks=3, pd=1, stride=1, dilations=[1, 2, 3])
        want = ind[:, :, 0].numpy()

        blocks = jnp.asarray(lr.numpy().transpose(0, 1, 3, 4, 2))
        ref_j = jnp.asarray(reflr.numpy().transpose(0, 2, 3, 1))
        got = np.asarray(masa_coarse_search(blocks, ref_j, (1, 2, 3)))
        np.testing.assert_array_equal(got, want)

    def test_fine_search(self, ref_masa):
        from textualdegremoval_tpu.ops.masa import masa_fine_search

        g = torch.Generator().manual_seed(101)
        nb, c = 4, 8
        lr = torch.randn(nb, c, 10, 10, generator=g)
        win = torch.randn(nb, c, 15, 17, generator=g)
        with torch.no_grad():
            corr, ind = ref_masa.search_org(lr, win, ks=3, pd=1, stride=1)
        want_ind = ind[:, :, :, 0].numpy()
        want_att = corr[:, :, :, 0].numpy()

        lr_j = jnp.asarray(lr.numpy().transpose(0, 2, 3, 1))
        win_j = jnp.asarray(win.numpy().transpose(0, 2, 3, 1))
        got_ind, got_att = masa_fine_search(lr_j, win_j, 3)
        np.testing.assert_array_equal(np.asarray(got_ind), want_ind)
        np.testing.assert_allclose(np.asarray(got_att), want_att, atol=1e-5)

    @pytest.mark.parametrize("scale", [1, 2, 4])
    def test_transfer(self, ref_masa, scale):
        from textualdegremoval_tpu.ops.masa import masa_transfer

        g = torch.Generator().manual_seed(102 + scale)
        nb, c = 3, 6
        d2y, d2x = 12, 14          # deepest-scale window size
        ky, kx = 8, 9              # LQ block size
        ry, rx = d2y - 2, d2x - 2  # fine-search patch grid
        fea = torch.randn(nb, c, d2y * scale, d2x * scale, generator=g)
        index = torch.randint(0, ry * rx, (nb, ky, kx), generator=g)
        soft = torch.rand(nb, 1, ky, kx, generator=g)
        with torch.no_grad():
            want = ref_masa.transfer(
                fea, index, soft, ks=3 * scale, pd=scale, stride=scale
            ).numpy()

        fea_j = jnp.asarray(fea.numpy().transpose(0, 2, 3, 1))
        got = masa_transfer(
            fea_j, jnp.asarray(index.numpy()), jnp.asarray(soft[:, 0].numpy()),
            psize=3, scale=scale)
        np.testing.assert_allclose(from_nhwc(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# full-size trunk parity (real widths + block counts from the task configs)
# ---------------------------------------------------------------------------


def _assert_forward_parity(tm, fm, inputs_torch, atol, rtol=1e-5,
                           outputs_are_list=False):
    """Run the torch reference net and our Flax net on the same weights and
    inputs; assert outputs match."""
    tm.eval()
    with torch.no_grad():
        want = tm(*inputs_torch)
    tree = split_batch_stats(convert_state_dict(tm.state_dict()))
    inputs_jax = tuple(
        to_nhwc(t) if t.dim() == 4 else jnp.asarray(t.numpy())
        for t in inputs_torch
    )
    variables = fm.init(KEY, *inputs_jax)
    assert verify_against_init(tree["params"], variables["params"]) == []
    got = fm.apply(tree, *inputs_jax)
    if outputs_are_list:
        for g_l, w_l in zip(got, want):
            np.testing.assert_allclose(
                from_nhwc(g_l), w_l.numpy(), atol=atol, rtol=rtol)
    else:
        np.testing.assert_allclose(from_nhwc(got), want.numpy(), atol=atol,
                                   rtol=rtol)


@slow
class TestFullSizeTrunkParity:
    """The real reference code, at the real options/train_restoration/*.yml
    hyperparameters (dim=48 / width=64, full block counts), minimal legal
    spatial size."""

    def test_restormer_dim48(self):
        from textualdegremoval_tpu.models.restormer import Restormer

        mod = load_ref_arch("network_restormer_guided_arch")
        kw = dict(dim=48, num_blocks=[4, 6, 6, 8], num_refinement_blocks=4,
                  heads=[1, 2, 4, 8], ffn_expansion_factor=2.66, bias=False,
                  LayerNorm_type="WithBias")
        tm = randomize(mod.Restormer(**kw), seed=1)
        x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(2))
        fm = Restormer(dim=48, num_blocks=(4, 6, 6, 8),
                       num_refinement_blocks=4, heads=(1, 2, 4, 8))
        _assert_forward_parity(tm, fm, (x,), atol=1e-4)

    def test_restormer_dual_pixel_dim48(self):
        from textualdegremoval_tpu.models.restormer import Restormer

        mod = load_ref_arch("network_restormer_guided_arch")
        tm = randomize(
            mod.Restormer(inp_channels=6, dim=48, num_blocks=[4, 6, 6, 8],
                          num_refinement_blocks=4, heads=[1, 2, 4, 8],
                          dual_pixel_task=True),
            seed=3)
        x = torch.randn(1, 6, 64, 64, generator=torch.Generator().manual_seed(4))
        fm = Restormer(inp_channels=6, dim=48, num_blocks=(4, 6, 6, 8),
                       num_refinement_blocks=4, heads=(1, 2, 4, 8),
                       dual_pixel_task=True)
        _assert_forward_parity(tm, fm, (x,), atol=1e-4)

    def test_nafnet_width64(self):
        from textualdegremoval_tpu.models.nafnet import NAFNet

        mod = load_ref_arch("network_nafnet_guided_arch")
        tm = randomize(
            mod.NAFNet(width=64, middle_blk_num=1,
                       enc_blk_nums=[1, 1, 1, 28], dec_blk_nums=[1, 1, 1, 1]),
            seed=5)
        x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(6))
        fm = NAFNet(width=64, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 28),
                    dec_blk_nums=(1, 1, 1, 1))
        _assert_forward_parity(tm, fm, (x,), atol=2e-4)

    def test_drsformer_dim48_with_mefc(self):
        from textualdegremoval_tpu.models.drsformer import DRSformer

        mod = load_ref_arch("network_drsformer_guided_arch")
        tm = randomize(
            mod.DRSformer(dim=48, num_blocks=[4, 6, 6, 8], heads=[1, 2, 4, 8]),
            seed=7)
        x = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(8))
        fm = DRSformer(dim=48, num_blocks=(4, 6, 6, 8), heads=(1, 2, 4, 8),
                       use_mefc=True)
        _assert_forward_parity(tm, fm, (x,), atol=2e-4)

    def test_promptir_dim48_decoder(self):
        from textualdegremoval_tpu.models.promptir import PromptIR

        mod = load_ref_arch("network_promptir_guided_arch")
        tm = randomize(
            mod.PromptIR(dim=48, num_blocks=[4, 6, 6, 8],
                         num_refinement_blocks=4, heads=[1, 2, 4, 8],
                         decoder=True),
            seed=9)
        x = torch.randn(1, 3, 64, 64,
                        generator=torch.Generator().manual_seed(10))
        fm = PromptIR(dim=48, num_blocks=(4, 6, 6, 8),
                      num_refinement_blocks=4, heads=(1, 2, 4, 8),
                      decoder=True)
        _assert_forward_parity(tm, fm, (x,), atol=2e-4)

    def test_sfnet_num_res16(self):
        from textualdegremoval_tpu.models.sfnet import SFNet

        mod = load_ref_arch("network_sfnet_guided_arch")
        # scale 0.02 keeps the norm-free 96-conv trunk's gain ~1 so f32
        # accumulation-order drift stays at machine epsilon (at 0.05 the
        # activations amplify to ~3e6 and drown structural comparison;
        # measured: 2.4e-7 max diff at 0.02 vs 2.8e4 at 0.05)
        tm = randomize(mod.SFNet(mode=["train"], num_res=16), seed=11,
                       scale=0.02)
        x = torch.randn(1, 3, 64, 64,
                        generator=torch.Generator().manual_seed(12))
        fm = SFNet(num_res=16, base_channel=32, use_running_average=True)
        _assert_forward_parity(tm, fm, (x,), atol=3e-4, outputs_are_list=True)

    def test_nafnet_dynamic_fusion_width64(self):
        from textualdegremoval_tpu.models.nafnet_dynamic import (
            NAFNetDynamicFusion,
        )

        mod = load_ref_arch("network_nafnet_guided_diffir_arch")
        tm = randomize(
            mod.NAFNetDynamicFusion(width=64, middle_blk_num=1,
                                    enc_blk_nums=[1, 1, 1, 28],
                                    dec_blk_nums=[1, 1, 1, 1]),
            seed=13)
        g = torch.Generator().manual_seed(14)
        x = torch.randn(1, 3, 64, 64, generator=g)
        # the reference SimpleGate_DynamicFusion kernel is Linear(10*1024, .)
        # (SURVEY §2.5 item 10) — only num_words=10 runs as shipped.
        k_v = torch.randn(1, 10, 1024, generator=g)
        fm = NAFNetDynamicFusion(width=64, middle_blk_num=1,
                                 enc_blk_nums=(1, 1, 1, 28),
                                 dec_blk_nums=(1, 1, 1, 1))
        # 28-block chain of k_v-scaled affines on random weights grows
        # activations to O(500); allow accumulation-order rtol
        _assert_forward_parity(tm, fm, (x, k_v), atol=1e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# RefFusion (MASA) full-forward parity: the NAFNet guided arch is the one
# self-consistent RefFusion in the reference — full search+transfer+fusion
# compared end-to-end against the real code.
# ---------------------------------------------------------------------------


class TestNAFNetRefFusionVsReference:
    def _run(self, kw, hw, seed, atol=2e-4):
        from textualdegremoval_tpu.models.nafnet import NAFNetRefFusion

        mod = load_ref_arch("network_nafnet_guided_arch")
        ref_kw = {k: list(v) if isinstance(v, tuple) else v
                  for k, v in kw.items()}
        # the reference takes the middle fusion depth as a 5th
        # reffusion_n_blocks entry (see TestMASAOpsVsReference fixture note)
        ref_kw["reffusion_n_blocks"] = (
            list(kw["reffusion_n_blocks"]) + [kw["reffusion_n_blocks_middle"]])
        tm = randomize(mod.NAFNetRefFusion(**ref_kw), seed=seed)
        g = torch.Generator().manual_seed(seed + 1)
        lq = torch.randn(1, 3, hw, hw, generator=g)
        ref = torch.randn(1, 3, hw, hw, generator=g)
        fm = NAFNetRefFusion(**kw)
        _assert_forward_parity(tm, fm, (lq, ref), atol=atol)

    @pytest.mark.slow
    def test_real_masa_geometry(self):
        """lr_block_size=8 (the config value) => full multi-block coarse
        search, border clamping, 5-scale gather/transfer — against the real
        reference forward."""
        self._run(
            dict(width=16, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 2),
                 dec_blk_nums=(1, 1, 1, 1), nf=16, ext_n_blocks=(1, 1, 1, 1),
                 reffusion_n_blocks=(1, 1, 1, 1), reffusion_n_blocks_middle=1,
                 lr_block_size=8),
            hw=128, seed=15)

    @slow
    def test_full_size_config002(self):
        """The exact 002_nafnet_single_image_motion_deblurring.yml network."""
        self._run(
            dict(width=64, middle_blk_num=1, enc_blk_nums=(1, 1, 1, 28),
                 dec_blk_nums=(1, 1, 1, 1), nf=64, ext_n_blocks=(4, 4, 4, 4),
                 reffusion_n_blocks=(2, 2, 2, 2), reffusion_n_blocks_middle=1,
                 lr_block_size=8),
            hw=128, seed=17, atol=3e-4)


# ---------------------------------------------------------------------------
# documented divergences (SURVEY §2.5): the reference code must fail the way
# the catalog says; our implementation of the intended semantics must run.
# ---------------------------------------------------------------------------


class TestI2TMapperVsReference:
    def test_mapper_parity(self):
        """The I2T Mapper as shipped in the reference tree
        (network_nafnet_guided_diffir_arch.py:27-68, the importable copy of
        scripts/train/main_train_i2t_mapping.py:40-81): per-word 4-layer
        MLPs for CLS + mean-pooled per-word patch MLPs."""
        from textualdegremoval_tpu.models.mappers import I2TMapper
        from textualdegremoval_tpu.convert.tower_maps import convert_mapper

        mod = load_ref_arch("network_nafnet_guided_diffir_arch")
        nw, din, dout = 4, 1280, 1024
        tm = randomize(mod.Mapper(din, dout, nw), seed=30)
        tm.eval()
        g = torch.Generator().manual_seed(31)
        embs = torch.randn(2, 9, din, generator=g)
        with torch.no_grad():
            want = tm((embs,)).numpy()  # reference takes a tuple (embs[0])

        fm = I2TMapper(num_words=nw, input_dim=din, output_dim=dout)
        params = {"params": convert_mapper(tm.state_dict(), nw)}
        init = fm.init(KEY, jnp.asarray(embs.numpy()))
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, jnp.asarray(embs.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestDocumentedDivergences:
    def test_restormer_reffusion_index_bug(self):
        """§2.5 item 1: the guided Restormer builds a 4-level MASA encoder but
        indexes feat[4] -> IndexError as shipped.  Ours fixes the pyramid
        indexing by construction and runs."""
        mod = load_ref_arch("network_restormer_guided_arch")
        tm = mod.RestormerRefFusion(
            dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
            heads=[1, 1, 2, 2], nf=8, ext_n_blocks=[1, 1, 1, 1],
            reffusion_n_blocks=[1, 1, 1, 1], lr_block_size=4)
        tm.eval()
        g = torch.Generator().manual_seed(19)
        lq = torch.randn(1, 3, 32, 32, generator=g)
        ref = torch.randn(1, 3, 32, 32, generator=g)
        with pytest.raises(IndexError):
            with torch.no_grad():
                tm(lq, ref)

        from textualdegremoval_tpu.models.restormer import RestormerRefFusion

        fm = RestormerRefFusion(
            dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
            heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
            reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
        lq_j, ref_j = to_nhwc(lq), to_nhwc(ref)
        out = fm.apply(fm.init(KEY, lq_j, ref_j), lq_j, ref_j)
        assert np.isfinite(np.asarray(out)).all()

    def test_sfnet_reffusion_broken_as_shipped(self):
        """§2.5 item 2: the reference SFNet guided forward cannot run (fusion
        blocks return unbound modules, feat[4] on a 3-level encoder...).
        Ours implements the intended semantics and runs (covered by
        tests/test_convert.py::TestSFNetFullConversion)."""
        mod = load_ref_arch("network_sfnet_guided_arch")
        tm = mod.SFNetRefFusion(mode=["train"], num_res=1, nf=8,
                                ext_n_blocks=[1, 1, 1],
                                reffusion_n_blocks=[1, 1, 1])
        tm.eval()
        g = torch.Generator().manual_seed(20)
        lq = torch.randn(1, 3, 64, 64, generator=g)
        ref = torch.randn(1, 3, 64, 64, generator=g)
        with pytest.raises(Exception):
            with torch.no_grad():
                tm(lq, ref)

    def test_drsformer_reffusion_index_bug(self):
        """§2.5 item 1 also applies to the guided DRSformer."""
        mod = load_ref_arch("network_drsformer_guided_arch")
        tm = mod.DRSformerRefFusion(
            dim=8, num_blocks=[1, 1, 1, 1], heads=[1, 1, 2, 2], nf=8,
            ext_n_blocks=[1, 1, 1, 1], reffusion_n_blocks=[1, 1, 1, 1],
            lr_block_size=4)
        tm.eval()
        g = torch.Generator().manual_seed(21)
        lq = torch.randn(1, 3, 32, 32, generator=g)
        ref = torch.randn(1, 3, 32, 32, generator=g)
        with pytest.raises(IndexError):
            with torch.no_grad():
                tm(lq, ref)

    def test_drsformer_200l_spa_file_broken_as_shipped(self):
        """The 200L/SPA copy (network_drsformer_guided_arch_200L_SPA.py)
        ships only the RefFusion class and cannot even construct: the file
        lacks `import functools` (used by its Encoder at :102), on top of
        the feat[4] index bug the family shares.  Our
        DRSformerRefFusion(use_mefc=False) is the working equivalent
        (registry name DRSformer200L_SPA_RefFusion)."""
        mod = load_ref_arch("network_drsformer_guided_arch_200L_SPA")
        with pytest.raises(NameError, match="functools"):
            mod.DRSformer200L_SPA_RefFusion(
                dim=8, num_blocks=[1, 1, 1, 1], heads=[1, 1, 2, 2], nf=8,
                ext_n_blocks=[1, 1, 1, 1], reffusion_n_blocks=[1, 1, 1, 1],
                lr_block_size=4)


class TestDataUtilsVsReference:
    def test_duf_downsample_matches_reference(self):
        """duf_downsample (reference data/utils_data.py:465-497) — Gaussian
        blur + strided sample + border crop; validated against the actual
        reference implementation (loaded with stub deps; torchvision absent
        so utils_image is faked)."""
        import importlib.util

        for name, attrs in [
            ("data", {}), ("data.transforms", {"mod_crop": lambda *a: None}),
            ("utils", {}),
            ("utils.utils_image", {"img2tensor": lambda *a, **k: None}),
            ("utils.utils_misc", {"scandir": lambda *a, **k: []}),
        ]:
            if name not in sys.modules:
                m = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(m, k, v)
                sys.modules[name] = m
        spec = importlib.util.spec_from_file_location(
            "data.utils_data", f"{REF_ROOT}/data/utils_data.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["data.utils_data"] = mod
        spec.loader.exec_module(mod)

        from textualdegremoval_tpu.data.transforms import duf_downsample

        rng = np.random.default_rng(0)
        x = rng.random((1, 1, 3, 32, 32)).astype(np.float32)
        want = mod.duf_downsample(torch.from_numpy(x), 13, 4).numpy()
        got = duf_downsample(x[0, 0].transpose(1, 2, 0)[None], 13, 4)
        np.testing.assert_allclose(
            got[0].transpose(2, 0, 1), want[0, 0], atol=1e-5)

    def test_img_rotate_smoke(self):
        from textualdegremoval_tpu.data.transforms import img_rotate

        img = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
        out = img_rotate(img, 90)
        assert out.shape == img.shape and np.isfinite(out).all()
