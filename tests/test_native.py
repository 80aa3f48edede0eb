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
