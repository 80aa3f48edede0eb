"""Image conversion and I/O utilities (reference utils/utils_image.py).

NHWC float [0,1] <-> uint8 HWC; imwrite via cv2 (BGR on disk)."""

from __future__ import annotations

import os

import cv2
import numpy as np


def tensor2img(t, rgb2bgr: bool = True, min_max=(0, 1)) -> np.ndarray:
    """(B?, H, W, C) float -> HWC uint8.  Mirrors the reference's tensor2img
    contract (clamp to min_max, scale to 255, round)."""
    arr = np.asarray(t)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip((arr - min_max[0]) / (min_max[1] - min_max[0]), 0, 1)
    arr = (arr * 255.0).round().astype(np.uint8)
    if rgb2bgr and arr.ndim == 3 and arr.shape[2] == 3:
        arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
    return arr


def imwrite(img: np.ndarray, path: str, auto_mkdir: bool = True) -> bool:
    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return cv2.imwrite(path, img)


def crop_border(img: np.ndarray, border: int) -> np.ndarray:
    if border == 0:
        return img
    return img[border:-border, border:-border, ...]
