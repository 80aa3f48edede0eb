"""Pipeline A datasets (reference data/guidance_generation_dataset.py).

* UnpairedLQHQDataset (:86-265) — I2T stage: any images; random square crop
  -> SD view in [-1,1] at `size` + CLIP-normalized 224 view; prompt template
  with placeholder index.
* PairedLQHQDataset (:269-552) — TR stage: task-aware LQ/HQ pairs; the CLIP
  view is the *degraded* image, the SD target the *clean* one; the denoise
  task synthesizes noise.  (The reference's task-choice expression always
  yields a bool — SURVEY.md §2.5.7; here tasks sample uniformly.)
* ReferenceGenerationDataset (:556-686) — inference: center-crop -> both
  views.
"""

from __future__ import annotations

import random

import cv2
import numpy as np

from textualdegremoval_tpu.data.pairing import scan_images
from textualdegremoval_tpu.data.datasets import imread_f32

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_view(img: np.ndarray, size: int = 224) -> np.ndarray:
    v = cv2.resize(img, (size, size))
    return (v - CLIP_MEAN) / CLIP_STD


def _random_square_crop(img, size, rng):
    h, w = img.shape[:2]
    if min(h, w) < size:
        scale = size / min(h, w)
        img = cv2.resize(img, (int(np.ceil(w * scale)),
                               int(np.ceil(h * scale))))
        h, w = img.shape[:2]
    top = rng.randint(0, h - size)
    left = rng.randint(0, w - size)
    return img[top : top + size, left : left + size]


class UnpairedLQHQDataset:
    def __init__(self, data_root: str, size: int = 512,
                 placeholder_index: int = 5, seed=None,
                 clip_size: int = 224):
        self.paths = scan_images(data_root)
        self.size = size
        self.clip_size = clip_size
        self.placeholder_index = placeholder_index
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        img = imread_f32(self.paths[idx % len(self.paths)])
        crop = _random_square_crop(img, self.size, self.rng)
        return {
            "pixel_values": crop * 2.0 - 1.0,
            "pixel_values_clip": clip_view(crop, self.clip_size),
            "index": self.placeholder_index,
        }


class PairedLQHQDataset:
    """TR stage.  tasks: subset of {'denoise', 'derain', 'dehaze', ...};
    each task maps to (lq_root, hq_root); denoise synthesizes noise from HQ."""

    def __init__(self, task_roots: dict[str, tuple[str | None, str]],
                 size: int = 512, placeholder_index: int = 5,
                 sigma_range=(5, 50), seed=None, clip_size: int = 224):
        self.tasks = sorted(task_roots)
        self.roots = {
            t: (scan_images(lq) if lq else None, scan_images(hq))
            for t, (lq, hq) in task_roots.items()
        }
        self.size = size
        self.placeholder_index = placeholder_index
        self.sigma_range = sigma_range
        self.clip_size = clip_size
        self.rng = random.Random(seed)
        # seeded noise synth (the reference draws from the global
        # numpy state — non-reproducible runs)
        self.np_rng = np.random.default_rng(seed)

    def __len__(self):
        return max(len(hq) for _, hq in self.roots.values())

    def __getitem__(self, idx):
        task = self.rng.choice(self.tasks)  # uniform over all tasks
        lq_paths, hq_paths = self.roots[task]
        hq = imread_f32(hq_paths[idx % len(hq_paths)])
        if lq_paths is None:  # denoise: synthesize
            crop_hq = _random_square_crop(hq, self.size, self.rng)
            sigma = self.rng.uniform(*self.sigma_range)
            crop_lq = crop_hq + self.np_rng.standard_normal(
                crop_hq.shape, np.float32) * np.float32(sigma / 255.0)
        else:
            lq = imread_f32(lq_paths[idx % len(lq_paths)])
            # identical crop for the aligned pair
            h, w = hq.shape[:2]
            size = self.size
            if min(h, w) < size:
                s = size / min(h, w)
                hq = cv2.resize(hq, (int(np.ceil(w * s)), int(np.ceil(h * s))))
                lq = cv2.resize(lq, (hq.shape[1], hq.shape[0]))
                h, w = hq.shape[:2]
            top = self.rng.randint(0, h - size)
            left = self.rng.randint(0, w - size)
            crop_hq = hq[top : top + size, left : left + size]
            crop_lq = lq[top : top + size, left : left + size]
        return {
            "pixel_values": crop_hq * 2.0 - 1.0,  # clean SD target
            "pixel_values_clip": clip_view(crop_lq, self.clip_size),
            "index": self.placeholder_index,
            "task": task,
        }


class ReferenceGenerationDataset:
    def __init__(self, data_root: str, size: int = 512,
                 placeholder_index: int = 5):
        self.paths = scan_images(data_root)
        self.size = size
        self.placeholder_index = placeholder_index

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        img = imread_f32(self.paths[idx])
        h, w = img.shape[:2]
        s = min(h, w)
        img = img[(h - s) // 2 : (h - s) // 2 + s,
                  (w - s) // 2 : (w - s) // 2 + s]
        img = cv2.resize(img, (self.size, self.size))
        return {
            "pixel_values": img * 2.0 - 1.0,
            "pixel_values_clip": clip_view(img),
            "index": self.placeholder_index,
            "path": self.paths[idx],
        }
