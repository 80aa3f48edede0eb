"""Golden tests: losses vs reference math; PSNR/SSIM vs torch/numpy oracles."""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from textualdegremoval_tpu.losses import (
    l1_loss, mse_loss, psnr_loss, charbonnier_loss, build_loss,
)
from textualdegremoval_tpu.metrics import calculate_psnr, calculate_ssim
from textualdegremoval_tpu.train.schedules import (
    cosine_annealing_restart_cyclic_lr,
    build_schedule,
    warmup_wrap,
)

RNG = np.random.default_rng(11)


class TestLosses:
    def test_l1(self):
        a = RNG.random((2, 8, 8, 3)).astype(np.float32)
        b = RNG.random((2, 8, 8, 3)).astype(np.float32)
        got = float(l1_loss(jnp.asarray(a), jnp.asarray(b), loss_weight=2.0))
        assert abs(got - 2.0 * np.abs(a - b).mean()) < 1e-6

    def test_psnr_loss(self):
        a = RNG.random((2, 8, 8, 3)).astype(np.float32)
        b = RNG.random((2, 8, 8, 3)).astype(np.float32)
        got = float(psnr_loss(jnp.asarray(a), jnp.asarray(b)))
        scale = 10 / math.log(10)
        want = scale * np.log(((a - b) ** 2).mean(axis=(1, 2, 3)) + 1e-8).mean()
        assert abs(got - want) < 1e-5

    def test_charbonnier(self):
        a = RNG.random((1, 4, 4, 3)).astype(np.float32)
        b = RNG.random((1, 4, 4, 3)).astype(np.float32)
        got = float(charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
        want = np.sqrt((a - b) ** 2 + 1e-6).mean()
        assert abs(got - want) < 1e-6

    def test_build_loss_from_yaml_opt(self):
        fn = build_loss({"type": "L1Loss", "loss_weight": 1, "reduction": "mean"})
        a = jnp.ones((1, 2, 2, 3))
        assert float(fn(a, a)) == 0.0


class TestPSNR:
    def test_matches_formula_255(self):
        a = RNG.integers(0, 256, (16, 16, 3)).astype(np.float64)
        b = np.clip(a + RNG.normal(0, 5, a.shape), 0, 255)
        got = calculate_psnr(a, b, crop_border=0)
        mse = ((a - b) ** 2).mean()
        want = 20 * np.log10(255 / np.sqrt(mse))
        assert abs(got - want) < 1e-9

    def test_crop_border(self):
        a = RNG.random((16, 16, 3))
        b = a.copy()
        b[0, 0] = 1 - b[0, 0]  # corrupt a border pixel
        assert calculate_psnr(a, b, crop_border=2) == float("inf")


def _torch_ssim3d(img1, img2, max_value):
    # oracle: 3-D gaussian window SSIM, replicate padding
    import cv2  # fallback if unavailable: build kernel manually

    def g1d(size=11, sigma=1.5):
        x = np.arange(size) - (size - 1) / 2
        k = np.exp(-(x ** 2) / (2 * sigma ** 2))
        return k / k.sum()

    k1 = g1d()
    kern = k1[:, None, None] * k1[None, :, None] * k1[None, None, :]
    conv = torch.nn.Conv3d(1, 1, 11, padding=5, bias=False,
                           padding_mode="replicate")
    with torch.no_grad():
        conv.weight[0, 0] = torch.tensor(kern)

    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    t1 = torch.tensor(img1).float()[None, None]
    t2 = torch.tensor(img2).float()[None, None]
    with torch.no_grad():
        mu1 = conv(t1)[0, 0]
        mu2 = conv(t2)[0, 0]
        s1 = conv(t1 * t1)[0, 0] - mu1 ** 2
        s2 = conv(t2 * t2)[0, 0] - mu2 ** 2
        s12 = conv(t1 * t2)[0, 0] - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
    return float((num / den).mean())


class TestSSIM:
    def test_3d_matches_torch_oracle(self):
        a = RNG.integers(0, 256, (24, 24, 3)).astype(np.float64)
        b = np.clip(a + RNG.normal(0, 10, a.shape), 0, 255)
        got = calculate_ssim(a, b, crop_border=0)
        want = _torch_ssim3d(a, b, 255.0)
        assert abs(got - want) < 1e-4

    def test_identical_images(self):
        a = RNG.integers(0, 256, (16, 16, 3)).astype(np.float64)
        assert abs(calculate_ssim(a, a, 0) - 1.0) < 1e-6


class TestSchedules:
    def test_cosine_cyclic_values(self):
        base = 3e-4
        sched = cosine_annealing_restart_cyclic_lr(
            base, periods=[100, 300], restart_weights=[1, 1],
            eta_mins=[3e-4, 1e-6],
        )
        # at step 0: eta + 0.5*(base-eta)*2 = base
        assert abs(float(sched(0)) - base) < 1e-9
        # end of first period: cos(pi) -> eta_min of period 1
        assert abs(float(sched(100)) - 3e-4) < 1e-9
        # just after restart: near base again with eta_mins[1]
        v101 = float(sched(101))
        assert v101 <= base and v101 > 1e-6
        # end of second period: eta_mins[1]
        assert abs(float(sched(400)) - 1e-6) < 1e-8

    def test_build_schedule_yaml(self):
        sched = build_schedule(2e-4, {
            "type": "CosineAnnealingRestartCyclicLR",
            "periods": [306000, 694000],
            "restart_weights": [1, 1],
            "eta_mins": [0.0003, 0.000001],
        })
        assert float(sched(0)) > 0

    def test_warmup(self):
        sched = warmup_wrap(lambda s: jnp.float32(1e-3), 100, 1e-3)
        assert float(sched(50)) < 1e-3
        assert abs(float(sched(200)) - 1e-3) < 1e-9
