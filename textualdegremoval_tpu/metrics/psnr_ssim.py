"""PSNR / SSIM with reference-equivalent semantics, SSIM on-device.

Parity targets:
* calculate_psnr — reference metrics/psnr_ssim.py:9-63 (float64 MSE, max
  value inferred 1 vs 255, optional crop border and Y channel).
* calculate_ssim — reference metrics/psnr_ssim.py:225-303: RGB images use a
  **3-D Gaussian window** (11^3, sigma 1.5, replicate padding) over (H,W,C);
  Y-channel uses the 2-D replicate-border variant (:184-222).  The reference
  runs the 3-D conv on CUDA; here it is one `lax.conv_general_dilated` on
  TPU (or CPU), jitted and cached per shape.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from textualdegremoval_tpu.utils.matlab import to_y_channel


def _as_hwc(img):
    if hasattr(img, "detach"):  # torch tensor
        img = img.detach().cpu().numpy()
        if img.ndim == 4:
            img = img[0]
        img = img.transpose(1, 2, 0)
    return np.asarray(img)


def calculate_psnr(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False):
    img1, img2 = _as_hwc(img1), _as_hwc(img2)
    if input_order == "CHW":
        img1, img2 = img1.transpose(1, 2, 0), img2.transpose(1, 2, 0)
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img1, img2 = to_y_channel(img1), to_y_channel(img2)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return 20.0 * np.log10(max_value / np.sqrt(mse))


def _gaussian_kernel_1d(size=11, sigma=1.5):
    """cv2.getGaussianKernel equivalent."""
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("max_value",))
def _ssim_3d_device(img1, img2, max_value: float):
    """3-D Gaussian-window SSIM over an (H, W, C) volume, replicate padded."""
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    k1 = jnp.asarray(_gaussian_kernel_1d(), jnp.float32)
    kern = k1[:, None, None] * k1[None, :, None] * k1[None, None, :]
    kern = kern[None, None]  # OIDHW (1,1,11,11,11)

    def filt(x):
        x = jnp.pad(x, ((5, 5), (5, 5), (5, 5)), mode="edge")
        x = x[None, None]  # NCDHW
        out = lax.conv_general_dilated(
            x, kern, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        return out[0, 0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)


@jax.jit
def _ssim_2d_device(img1, img2):
    """2-D Gaussian SSIM with replicate borders (Y-channel path), range 255."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    k1 = jnp.asarray(_gaussian_kernel_1d(), jnp.float32)
    kern = (k1[:, None] * k1[None, :])[None, None]

    def filt(x):
        x = jnp.pad(x, ((5, 5), (5, 5)), mode="edge")
        out = lax.conv_general_dilated(
            x[None, None], kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out[0, 0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)


def calculate_ssim(img1, img2, crop_border=0, input_order="HWC",
                   test_y_channel=False):
    img1, img2 = _as_hwc(img1), _as_hwc(img2)
    if input_order == "CHW":
        img1, img2 = img1.transpose(1, 2, 0), img2.transpose(1, 2, 0)
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        y1 = to_y_channel(img1)[..., 0]
        y2 = to_y_channel(img2)[..., 0]
        return float(_ssim_2d_device(jnp.asarray(y1, jnp.float32),
                                     jnp.asarray(y2, jnp.float32)))
    max_value = 1.0 if img1.max() <= 1 else 255.0
    return float(
        _ssim_3d_device(jnp.asarray(img1, jnp.float32),
                        jnp.asarray(img2, jnp.float32), max_value)
    )
