"""Native data-path library: build + parity with the numpy reference ops."""

import numpy as np
import pytest

from textualdegremoval_tpu.data import native
from textualdegremoval_tpu.data.transforms import _aug_mode

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++/native lib unavailable")

RNG = np.random.default_rng(3)


class TestNative:
    def test_u8_to_f32(self):
        img = RNG.integers(0, 256, (7, 9, 3), np.uint8)
        got = native.u8_to_f32(img)
        np.testing.assert_allclose(got, img.astype(np.float32) / 255.0,
                                   atol=1e-7)

    @pytest.mark.parametrize("mode", range(8))
    def test_augment_matches_numpy(self, mode):
        img = RNG.standard_normal((5, 7, 3)).astype(np.float32)
        got = native.augment_f32(img, mode)
        want = _aug_mode(img, mode)
        np.testing.assert_array_equal(got, want)

    def test_noise_deterministic(self):
        img = RNG.random((64, 64, 3)).astype(np.float32)
        a = native.add_gaussian_noise(img, 15.0, seed=42)
        b = native.add_gaussian_noise(img, 15.0, seed=42)
        np.testing.assert_array_equal(a, b)
        assert abs((a - img).std() - 15 / 255.0) < 2e-3

    def test_batch_prepare(self):
        imgs = [RNG.integers(0, 256, (20, 24, 3), np.uint8) for _ in range(4)]
        crops = [(2, 3), (0, 0), (4, 8), (1, 1)]
        modes = [0, 1, 2, 5]
        got = native.batch_prepare(imgs, crops, patch=8, modes=modes)
        assert got.shape == (4, 8, 8, 3)
        for i in range(4):
            f = imgs[i].astype(np.float32) / 255.0
            crop = f[crops[i][0]:crops[i][0] + 8, crops[i][1]:crops[i][1] + 8]
            np.testing.assert_allclose(got[i], _aug_mode(crop, modes[i]),
                                       atol=1e-6)


class TestNativeDecode:
    @pytest.fixture()
    def imgs(self, tmp_path):
        import cv2

        rng = np.random.default_rng(9)
        paths = []
        for i, ext in enumerate((".png", ".jpg")):
            img = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
            p = str(tmp_path / f"img{i}{ext}")
            cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            paths.append((p, img))
        return paths

    def test_decode_matches_cv2(self, imgs):
        import cv2

        if not native.decode_available():
            pytest.skip("native decode lib unavailable")
        for p, _ in imgs:
            got = native.decode_rgb(p)
            want = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                                cv2.COLOR_BGR2RGB)
            assert got.shape == want.shape
            if p.endswith(".png"):
                np.testing.assert_array_equal(got, want)
            else:  # jpeg decoders may differ by rounding
                assert np.abs(got.astype(int) - want.astype(int)).mean() < 2

    def test_batch_decode(self, imgs):
        if not native.decode_available():
            pytest.skip("native decode lib unavailable")
        outs = native.decode_batch_rgb([p for p, _ in imgs], n_threads=2)
        assert len(outs) == 2
        assert all(o.dtype == np.uint8 and o.ndim == 3 for o in outs)

    def test_16bit_png_normalized(self, tmp_path):
        import cv2

        if not native.decode_available():
            pytest.skip("native decode lib unavailable")
        img16 = (np.random.default_rng(1).random((8, 8, 3)) * 65535).astype(
            np.uint16)
        p = str(tmp_path / "deep.png")
        cv2.imwrite(p, img16)
        out = native.decode_rgb(p)
        assert out.dtype == np.uint8 and out.shape == (8, 8, 3)
