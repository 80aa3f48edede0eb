"""Restoration datasets (host-side, HWC RGB float32 in [0,1]).

Parity: reference data/restoration_dataset.py:45-793.  Differences by
design:
* images are decoded straight to RGB (the reference round-trips BGR);
* the all-in-one dataset reads the ref image correctly (reference bug
  SURVEY.md §2.5.6 decodes the previous file's bytes);
* outputs are NHWC numpy arrays ready for device_put (no CHW tensors).
"""

from __future__ import annotations

import random

import cv2
import numpy as np

from textualdegremoval_tpu.data.pairing import (
    paired_paths_from_folder,
    tri_paths_from_folder,
    paths_from_meta_info,
)
from textualdegremoval_tpu.data.transforms import (
    paired_random_crop,
    random_augmentation,
    reflect_pad_to,
)

cv2.setNumThreads(1)


def imread_f32(path: str, bit16: bool = False) -> np.ndarray:
    """Read an image as HWC RGB float32 in [0,1].

    8-bit PNG/JPEG goes through the native libpng/libjpeg decoder
    (native/tdr_decode.cc, PNG bit-exact vs cv2) with the u8->f32 convert in
    C; cv2 handles 16-bit and exotic formats."""
    if not bit16 and path.lower().endswith((".png", ".jpg", ".jpeg")):
        from textualdegremoval_tpu.data import native as _native

        if _native.decode_available():
            try:
                return _native.u8_to_f32(_native.decode_rgb(path))
            except (IOError, FileNotFoundError):
                pass  # fall through to cv2 (16-bit png lands here too)
    flag = cv2.IMREAD_UNCHANGED if bit16 else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=2)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    maxv = 65535.0 if img.dtype == np.uint16 else 255.0
    return img.astype(np.float32) / maxv


class PairedImageDataset:
    """lq/gt pairs (reference Dataset_PairedImage :45-157)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths = paired_paths_from_folder(
            (opt["lqroot"], opt["hqroot"]), ("lq", "gt"),
            opt.get("filename_tmpl", "{}"),
        )
        self.is_train = opt.get("phase", "train") == "train"
        self.rng = random.Random(opt.get("seed"))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        rec = self.paths[idx % len(self.paths)]
        lq = imread_f32(rec["lq_path"])
        gt = imread_f32(rec["gt_path"])
        if self.is_train:
            gs = self.opt.get("gt_size", 128)
            lq, gt = reflect_pad_to(lq, gs), reflect_pad_to(gt, gs)
            gt, lq = paired_random_crop(gt, lq, gs, self.opt.get("scale", 1),
                                        self.rng)
            if self.opt.get("geometric_augs", False):
                lq, gt = random_augmentation(lq, gt, rng=self.rng)
        return {"lq": lq, "gt": gt, "lq_path": rec["lq_path"],
                "gt_path": rec["gt_path"]}


class PairedImageWithRefDataset:
    """lq/gt crop+augment; ref passed FULL-SIZE uncropped (reference
    Dataset_PairedImageWithRef :161-254 — ref-crop selection happens in the
    trainer via the DINO matcher)."""

    _packed = False  # flipped by _init_packed_io; class default keeps every
    # subclass __init__ safe even if it skips the io_backend setup

    def __init__(self, opt: dict):
        self.opt = opt
        if not self._init_packed_io(opt):
            self.paths = tri_paths_from_folder(
                (opt["lqroot"], opt["hqroot"], opt["refroot"]),
                ("lq", "gt", "ref"), opt.get("filename_tmpl", "{}"),
            )
        self.is_train = opt.get("phase", "train") == "train"
        self.rng = random.Random(opt.get("seed"))

    def _init_packed_io(self, opt: dict) -> bool:
        """When io_backend is a keyed archive (tfrecord or lmdb), open the
        three archives and build self.paths from their (identical) key
        sets; returns whether the packed path is active.  Roots are packed
        TFRecord prefixes (data/packed.py) or reference ``*.lmdb`` dirs
        (data/lmdb_reader.py — readable without the lmdb package); a
        key-set mismatch across the archives means a misbuilt archive and
        fails loudly instead of silently shrinking the dataset (the disk
        path's pairing raises on mismatches too)."""
        io = opt.get("io_backend", {"type": "disk"})
        self._packed = io.get("type") in ("tfrecord", "lmdb")
        if not self._packed:
            return False
        if io["type"] == "lmdb":
            from textualdegremoval_tpu.data.lmdb_reader import LmdbKeyedReader

            def open_packed(root):
                return LmdbKeyedReader(root)
        else:
            from textualdegremoval_tpu.data.packed import open_packed

        self._readers = {
            "lq": open_packed(opt["lqroot"]),
            "gt": open_packed(opt["hqroot"]),
            "ref": open_packed(opt["refroot"]),
        }
        sets = {k: set(r.keys()) for k, r in self._readers.items()}
        common = sets["lq"] & sets["gt"] & sets["ref"]
        dropped = {k: sorted(s - common) for k, s in sets.items() if s - common}
        if dropped:
            detail = "; ".join(
                f"{k}: {len(v)} unmatched (e.g. {v[:3]})"
                for k, v in dropped.items())
            raise ValueError(
                f"packed archives disagree on keys — {detail}. "
                "Rebuild the archives from matched folders.")
        self.paths = [
            {"lq_path": k, "gt_path": k, "ref_path": k} for k in sorted(common)]
        return True

    def __len__(self):
        return len(self.paths)

    def _read(self, kind: str, rec_path: str) -> np.ndarray:
        if self._packed:
            from textualdegremoval_tpu.data.packed import imdecode_f32

            return imdecode_f32(self._readers[kind].get(rec_path))
        return imread_f32(rec_path)

    def __getitem__(self, idx):
        rec = self.paths[idx % len(self.paths)]
        lq = self._read("lq", rec["lq_path"])
        gt = self._read("gt", rec["gt_path"])
        ref = self._read("ref", rec["ref_path"])
        if self.is_train:
            gs = self.opt.get("gt_size", 128)
            lq, gt = reflect_pad_to(lq, gs), reflect_pad_to(gt, gs)
            gt, lq = paired_random_crop(gt, lq, gs, self.opt.get("scale", 1),
                                        self.rng)
            if self.opt.get("geometric_augs", False):
                lq, gt = random_augmentation(lq, gt, rng=self.rng)
        return {"lq": lq, "gt": gt, "ref": ref,
                "lq_path": rec["lq_path"], "gt_path": rec["gt_path"],
                "ref_path": rec["ref_path"]}


class GaussianDenoisingWithRefDataset:
    """Synthetic-noise denoising with ref (reference
    Dataset_GaussianDenoisingWithRef :368-501): sigma constant / random-range
    / choice at train; deterministic seeded noise at test."""

    def __init__(self, opt: dict):
        self.opt = opt
        folders = (opt["hqroot"], opt["hqroot"], opt["refroot"])
        self.paths = tri_paths_from_folder(folders, ("lq", "gt", "ref"))
        self.is_train = opt.get("phase", "train") == "train"
        self.sigma_type = opt.get("sigma_type", "constant")
        self.sigma_range = opt.get("sigma_range", 15)
        self.sigma_test = opt.get("sigma_test", 15)
        self.in_ch = opt.get("in_ch", 3)
        self.rng = random.Random(opt.get("seed"))

    def __len__(self):
        return len(self.paths)

    def _train_sigma(self):
        if self.sigma_type == "constant":
            return self.sigma_range
        if self.sigma_type == "random":
            return self.rng.uniform(*self.sigma_range)
        return self.rng.choice(self.sigma_range)  # 'choice'

    def __getitem__(self, idx):
        rec = self.paths[idx % len(self.paths)]
        gt = imread_f32(rec["gt_path"])
        ref = imread_f32(rec["ref_path"])
        if self.in_ch == 1:
            gt = cv2.cvtColor(gt, cv2.COLOR_RGB2GRAY)[..., None]
            ref = cv2.cvtColor(ref, cv2.COLOR_RGB2GRAY)[..., None]
        if self.is_train:
            gs = self.opt.get("gt_size", 128)
            gt = reflect_pad_to(gt, gs)
            gt, _ = paired_random_crop(gt, gt.copy(), gs, 1, self.rng)
            if self.opt.get("geometric_augs", True):
                (gt,) = random_augmentation(gt, rng=self.rng)
            sigma = self._train_sigma()
            noise = np.float32(
                np.random.randn(*gt.shape)) * sigma / 255.0
            lq = gt + noise
        else:
            # deterministic eval protocol (np.random.seed(0), reference
            # :479-480 and eval scripts)
            rng = np.random.RandomState(0)
            lq = gt + rng.randn(*gt.shape).astype(np.float32) * \
                self.sigma_test / 255.0
        return {"lq": lq.astype(np.float32), "gt": gt, "ref": ref,
                "lq_path": rec["gt_path"], "gt_path": rec["gt_path"],
                "ref_path": rec["ref_path"]}


class PairedDehazeWithRefDataset(PairedImageWithRefDataset):
    """Dehaze pairs via meta_info haze->gt name mapping (reference
    Dataset_PairedDehazeWithRef :505-621)."""

    def __init__(self, opt: dict):
        self.opt = opt
        if not self._init_packed_io(opt):
            meta = opt.get("meta_info_file")
            if meta:
                self.paths = paths_from_meta_info(
                    meta, (opt["lqroot"], opt["hqroot"], opt["refroot"]),
                    ("lq", "gt", "ref"))
            else:
                self.paths = tri_paths_from_folder(
                    (opt["lqroot"], opt["hqroot"], opt["refroot"]),
                    ("lq", "gt", "ref"))
        self.is_train = opt.get("phase", "train") == "train"
        self.rng = random.Random(opt.get("seed"))


class PairedUnifiedWithRefDataset:
    """All-in-one dataset: random task per sample from
    {denoise sigma15/25/50, derain, dehaze} (reference
    Dataset_PairedUnifiedWithRef :625-793, with the ref-read bug fixed)."""

    TASKS = ("denoise_15", "denoise_25", "denoise_50", "derain", "dehaze")

    def __init__(self, opt: dict):
        self.opt = opt
        self.rng = random.Random(opt.get("seed"))
        self.is_train = opt.get("phase", "train") == "train"
        # per-task path tables
        self.task_paths = {}
        for task in ("denoise", "derain", "dehaze"):
            sub = opt.get(task)
            if not sub:
                continue
            if task == "denoise":
                folders = (sub["hqroot"], sub["hqroot"], sub["refroot"])
            else:
                folders = (sub["lqroot"], sub["hqroot"], sub["refroot"])
            self.task_paths[task] = tri_paths_from_folder(
                folders, ("lq", "gt", "ref"))

    def __len__(self):
        return max(len(v) for v in self.task_paths.values())

    def __getitem__(self, idx):
        avail = [t for t in self.TASKS if t.split("_")[0] in self.task_paths]
        task = self.rng.choice(avail)
        base = task.split("_")[0]
        paths = self.task_paths[base]
        rec = paths[idx % len(paths)]
        gt = imread_f32(rec["gt_path"])
        ref = imread_f32(rec["ref_path"])
        if base == "denoise":
            sigma = float(task.split("_")[1])
            gs = self.opt.get("gt_size", 128)
            gt = reflect_pad_to(gt, gs)
            gt, _ = paired_random_crop(gt, gt.copy(), gs, 1, self.rng)
            lq = gt + np.float32(np.random.randn(*gt.shape)) * sigma / 255.0
        else:
            lq = imread_f32(rec["lq_path"])
            gs = self.opt.get("gt_size", 128)
            lq, gt = reflect_pad_to(lq, gs), reflect_pad_to(gt, gs)
            gt, lq = paired_random_crop(gt, lq, gs, 1, self.rng)
        if self.opt.get("geometric_augs", True):
            lq, gt = random_augmentation(lq, gt, rng=self.rng)
        return {"lq": lq.astype(np.float32), "gt": gt, "ref": ref,
                "task": task}


class PairedImageDPWithRefDataset:
    """Dual-pixel 16-bit: lqL+lqR concatenated to 6 channels (reference
    Dataset_PairedImageWithRef_DualPixel_16bit :258-364)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.rng = random.Random(opt.get("seed"))
        self.is_train = opt.get("phase", "train") == "train"
        from textualdegremoval_tpu.data.pairing import scan_images
        gt = scan_images(opt["hqroot"])
        lql = scan_images(opt["lqlroot"])
        lqr = scan_images(opt["lqrroot"])
        ref = scan_images(opt["refroot"])
        assert len(gt) == len(lql) == len(lqr) == len(ref)
        self.paths = [
            {"gt_path": g, "lql_path": l, "lqr_path": r, "ref_path": f}
            for g, l, r, f in zip(gt, lql, lqr, ref)
        ]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        rec = self.paths[idx % len(self.paths)]
        gt = imread_f32(rec["gt_path"], bit16=True)
        lql = imread_f32(rec["lql_path"], bit16=True)
        lqr = imread_f32(rec["lqr_path"], bit16=True)
        ref = imread_f32(rec["ref_path"])
        lq = np.concatenate([lql, lqr], axis=-1)  # 6 channels
        if self.is_train:
            gs = self.opt.get("gt_size", 128)
            lq, gt = reflect_pad_to(lq, gs), reflect_pad_to(gt, gs)
            gt, lq = paired_random_crop(gt, lq, gs, 1, self.rng)
            if self.opt.get("geometric_augs", False):
                lq, gt = random_augmentation(lq, gt, rng=self.rng)
        return {"lq": lq, "gt": gt, "ref": ref}
