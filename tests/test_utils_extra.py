"""imresize vs torch/PIL oracle, flow_warp, file client, mixing, guidance
datasets."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import cv2

from textualdegremoval_tpu.utils.imresize import imresize
from textualdegremoval_tpu.ops.flow import flow_warp, resize_flow
from textualdegremoval_tpu.utils.file_client import FileClient
from textualdegremoval_tpu.train.mixing import mixing_augment

RNG = np.random.default_rng(5)


class TestImresize:
    def test_downscale_matches_matlab_convention(self):
        """Oracle: torch's antialiased bicubic interpolate matches MATLAB
        imresize for downscaling."""
        import torch
        import torch.nn.functional as F

        img = RNG.random((32, 40, 3)).astype(np.float64)
        got = imresize(img, 0.5)
        t = torch.from_numpy(img.transpose(2, 0, 1))[None]
        want = F.interpolate(t, scale_factor=0.5, mode="bicubic",
                             antialias=True, align_corners=False)
        want = want[0].numpy().transpose(1, 2, 0)
        # interiors agree to machine precision; borders differ because torch
        # does not use MATLAB's symmetric boundary reflection (ours does)
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                                   atol=1e-10)
        assert np.isfinite(got).all()

    def test_identity_scale(self):
        img = RNG.random((8, 8)).astype(np.float64)
        np.testing.assert_allclose(imresize(img, 1.0), img, atol=1e-10)

    def test_out_shape(self):
        img = RNG.random((20, 30, 3))
        assert imresize(img, out_shape=(10, 15)).shape == (10, 15, 3)


class TestFlowWarp:
    def test_zero_flow_identity(self):
        x = jnp.asarray(RNG.random((1, 8, 8, 2)).astype(np.float32))
        flow = jnp.zeros((1, 8, 8, 2))
        np.testing.assert_allclose(np.asarray(flow_warp(x, flow)),
                                   np.asarray(x), atol=1e-6)

    def test_integer_shift(self):
        x = jnp.asarray(RNG.random((1, 8, 8, 1)).astype(np.float32))
        flow = jnp.ones((1, 8, 8, 2))  # shift by (+1, +1)
        out = np.asarray(flow_warp(x, flow))
        np.testing.assert_allclose(out[0, :7, :7], np.asarray(x)[0, 1:, 1:],
                                   atol=1e-6)

    def test_resize_flow_scales_values(self):
        flow = jnp.ones((1, 4, 4, 2))
        out = resize_flow(flow, "ratio", (2, 2))
        assert out.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


class TestFileClient:
    def test_disk(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"hello")
        assert FileClient("disk").get(str(p)) == b"hello"

    def test_unknown_backend(self):
        with pytest.raises(ValueError):
            FileClient("carrier_pigeon")


class TestMixing:
    def test_shapes_and_range(self):
        rng = jax.random.PRNGKey(0)
        t = jnp.asarray(RNG.random((4, 8, 8, 3)).astype(np.float32))
        x = jnp.asarray(RNG.random((4, 8, 8, 3)).astype(np.float32))
        _, t2, x2 = mixing_augment(rng, t, x, use_identity=False)
        assert t2.shape == t.shape
        assert float(t2.min()) >= 0 and float(t2.max()) <= 1


class TestGuidanceDatasets:
    @pytest.fixture()
    def roots(self, tmp_path):
        for sub in ("any", "lq", "hq"):
            (tmp_path / sub).mkdir()
        for i in range(3):
            img = (RNG.random((64, 80, 3)) * 255).astype(np.uint8)
            for sub in ("any", "lq", "hq"):
                cv2.imwrite(str(tmp_path / sub / f"{i}.png"), img)
        return tmp_path

    def test_unpaired(self, roots):
        from textualdegremoval_tpu.data.guidance import UnpairedLQHQDataset

        ds = UnpairedLQHQDataset(str(roots / "any"), size=32, seed=0)
        s = ds[0]
        assert s["pixel_values"].shape == (32, 32, 3)
        assert s["pixel_values_clip"].shape == (224, 224, 3)
        assert -1.01 <= s["pixel_values"].min() <= s["pixel_values"].max() <= 1.01

    def test_paired_tasks(self, roots):
        from textualdegremoval_tpu.data.guidance import PairedLQHQDataset

        ds = PairedLQHQDataset(
            {"denoise": (None, str(roots / "hq")),
             "derain": (str(roots / "lq"), str(roots / "hq"))},
            size=32, seed=1)
        tasks = {ds[i]["task"] for i in range(10)}
        assert tasks == {"denoise", "derain"}

    def test_reference_generation(self, roots):
        from textualdegremoval_tpu.data.guidance import (
            ReferenceGenerationDataset,
        )

        ds = ReferenceGenerationDataset(str(roots / "any"), size=64)
        s = ds[0]
        assert s["pixel_values"].shape == (64, 64, 3)


class TestModelComplexity:
    def test_params_and_macs_linear(self):
        """Known-arithmetic oracle: y = x @ W is exactly
        2*M*N*K flops, M*N params (reference ptflops accounting,
        network_nafnet_guided_diffir_arch.py:656-679)."""
        from textualdegremoval_tpu.utils.profiling import (
            count_params, model_complexity)

        w = jnp.ones((64, 32))
        assert count_params({"w": w}) == 64 * 32
        out = model_complexity(lambda p, x: x @ p["w"], {"w": w},
                               jnp.ones((8, 64)))
        assert out["params"] == 64 * 32
        assert out["flops"] == 2 * 8 * 64 * 32
        assert out["macs"] == 8 * 64 * 32

    def test_network_complexity_runs(self):
        """End-to-end on a tiny registered network."""
        from textualdegremoval_tpu.models import define_network
        from textualdegremoval_tpu.utils.profiling import model_complexity

        net = define_network({
            "type": "Restormer", "inp_channels": 3, "out_channels": 3,
            "dim": 8, "num_blocks": [1, 1, 1, 1],
            "num_refinement_blocks": 1, "heads": [1, 1, 2, 2],
            "ffn_expansion_factor": 2, "bias": False,
            "LayerNorm_type": "WithBias",
        })
        x = jnp.zeros((1, 32, 32, 3))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        out = model_complexity(
            lambda p, a: net.apply({"params": p}, a), params, x)
        assert out["params"] > 1000 and out["flops"] > 1e6
