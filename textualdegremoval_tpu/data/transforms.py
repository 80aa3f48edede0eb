"""Paired crops and geometric augmentations (host-side numpy, HWC).

Parity: reference data/transforms.py:5-275 (paired_random_crop, augment with
hflip/vflip/rot90, random_augmentation's 8 modes, mod_crop) and
utils/utils_image.py padding (reflect pad to min size)."""

from __future__ import annotations

import random

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    h, w = img.shape[:2]
    return img[: h - h % scale, : w - w % scale, ...]


def reflect_pad_to(img: np.ndarray, size: int) -> np.ndarray:
    """Reflect-pad bottom/right so both dims are >= size (reference
    utils_image.padding)."""
    h, w = img.shape[:2]
    ph, pw = max(0, size - h), max(0, size - w)
    if ph == 0 and pw == 0:
        return img
    return np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")


def paired_random_crop(img_gts, img_lqs, gt_patch_size, scale=1, rng=None):
    """Random crop of lq (patch/scale) and matching gt patch.

    Accepts single arrays or lists; returns same structure."""
    rng = rng or random
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    gts = [img_gts] if single_gt else img_gts
    lqs = [img_lqs] if single_lq else img_lqs

    lq_patch = gt_patch_size // scale
    h_lq, w_lq = lqs[0].shape[:2]
    if h_lq < lq_patch or w_lq < lq_patch:
        raise ValueError(
            f"LQ ({h_lq}x{w_lq}) smaller than patch {lq_patch}; pad first"
        )
    top = rng.randint(0, h_lq - lq_patch)
    left = rng.randint(0, w_lq - lq_patch)
    lqs = [v[top : top + lq_patch, left : left + lq_patch, ...] for v in lqs]
    top_gt, left_gt = top * scale, left * scale
    gts = [v[top_gt : top_gt + gt_patch_size,
             left_gt : left_gt + gt_patch_size, ...] for v in gts]
    return (gts[0] if single_gt else gts), (lqs[0] if single_lq else lqs)


def augment(imgs, hflip=True, rotation=True, rng=None):
    """Random hflip/vflip/rot90 applied consistently to all images."""
    rng = rng or random
    do_h = hflip and rng.random() < 0.5
    do_v = rotation and rng.random() < 0.5
    do_r = rotation and rng.random() < 0.5

    def _aug(img):
        if do_h:
            img = img[:, ::-1, ...]
        if do_v:
            img = img[::-1, :, ...]
        if do_r:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    single = not isinstance(imgs, list)
    out = [_aug(v) for v in ([imgs] if single else imgs)]
    return out[0] if single else out


def _aug_mode(img: np.ndarray, mode: int) -> np.ndarray:
    """The 8 dihedral modes of reference random_augmentation/data_augmentation."""
    if mode == 0:
        out = img
    elif mode == 1:
        out = np.flipud(img)
    elif mode == 2:
        out = np.rot90(img)
    elif mode == 3:
        out = np.flipud(np.rot90(img))
    elif mode == 4:
        out = np.rot90(img, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(img, k=2))
    elif mode == 6:
        out = np.rot90(img, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(img, k=3))
    else:
        raise ValueError(mode)
    return np.ascontiguousarray(out)


def random_augmentation(*imgs, rng=None):
    rng = rng or random
    mode = rng.randint(0, 7)
    return [_aug_mode(img, mode) for img in imgs]


def img_rotate(img, angle, center=None, scale=1.0):
    """Rotate by `angle` degrees (ccw) about `center` with isotropic
    `scale` (reference data/transforms.py:203-221)."""
    import cv2

    h, w = img.shape[:2]
    if center is None:
        center = (w // 2, h // 2)
    matrix = cv2.getRotationMatrix2D(center, angle, scale)
    return cv2.warpAffine(img, matrix, (w, h))


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6):
    """2-D Gaussian kernel (reference data/utils_data.py:444-462)."""
    import numpy as np
    from scipy.ndimage import filters as _f

    kernel = np.zeros((kernel_size, kernel_size))
    kernel[kernel_size // 2, kernel_size // 2] = 1
    return _f.gaussian_filter(kernel, sigma)


def duf_downsample(x, kernel_size: int = 13, scale: int = 4):
    """Gaussian-blur + strided downsample, DUF protocol (reference
    data/utils_data.py:465-497: reflect-pad by k//2 + 2*scale, depthwise
    Gaussian conv at stride `scale`, then crop 2 border pixels).

    x: (..., H, W, C) numpy array.  Returns (..., H//scale, W//scale, C).
    """
    import numpy as np
    from scipy.ndimage import convolve

    assert scale in (2, 3, 4), f"Only scale (2, 3, 4) supported, got {scale}"
    kernel = generate_gaussian_kernel(kernel_size, 0.4 * scale)
    k2 = kernel_size // 2
    pad = k2 + scale * 2
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    outs = []
    for img in x.reshape((-1, h, w, c)):
        p = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        blur = np.stack(
            [convolve(p[:, :, ch], kernel, mode="constant")
             for ch in range(c)], axis=-1)
        # valid conv region of the padded tensor, sampled at stride `scale`
        valid = blur[k2: p.shape[0] - k2, k2: p.shape[1] - k2]
        sub = valid[::scale, ::scale]
        # the reference crops 2 pixels of the (scale*2-padded) borders
        outs.append(sub[2: 2 + h // scale, 2: 2 + w // scale])
    return np.stack(outs).reshape(lead + outs[0].shape)
