"""Path pairing utilities (reference data/utils_data.py:94-497).

All functions return lists of dicts with `{key}_path` entries, sorted for
determinism."""

from __future__ import annotations

import os
import os.path as osp


IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp", ".PNG",
            ".JPG", ".JPEG")


def scan_images(folder: str) -> list[str]:
    out = []
    for root, _, files in os.walk(folder):
        for f in files:
            if f.endswith(IMG_EXTS):
                out.append(osp.join(root, f))
    return sorted(out)


def paired_paths_from_folder(folders, keys, filename_tmpl="{}"):
    """[(lq_folder, gt_folder)], keys ('lq','gt'): match by basename."""
    in_folder, gt_folder = folders
    in_key, gt_key = keys
    gt_paths = scan_images(gt_folder)
    paths = []
    for gt_path in gt_paths:
        base, ext = osp.splitext(osp.basename(gt_path))
        in_name = filename_tmpl.format(base) + ext
        in_path = osp.join(in_folder, in_name)
        if not osp.exists(in_path):
            # fall back to same-index matching of sorted listings
            continue
        paths.append({f"{in_key}_path": in_path, f"{gt_key}_path": gt_path})
    if not paths:
        in_paths = scan_images(in_folder)
        assert len(in_paths) == len(gt_paths), (
            f"{in_key} and {gt_key} counts differ: {len(in_paths)} vs "
            f"{len(gt_paths)}")
        paths = [
            {f"{in_key}_path": i, f"{gt_key}_path": g}
            for i, g in zip(in_paths, gt_paths)
        ]
    return paths


def tri_paths_from_folder(folders, keys, filename_tmpl="{}"):
    """[(lq, gt, ref)]: pairing by basename with index fallback."""
    lq_folder, gt_folder, ref_folder = folders
    lq_key, gt_key, ref_key = keys
    gt_paths = scan_images(gt_folder)
    lq_paths = scan_images(lq_folder)
    ref_paths = scan_images(ref_folder)
    paths = []
    by_name = all(
        osp.exists(osp.join(lq_folder, osp.basename(p))) and
        osp.exists(osp.join(ref_folder, osp.basename(p)))
        for p in gt_paths[: min(4, len(gt_paths))]
    ) and len(gt_paths) > 0
    if by_name:
        for gt_path in gt_paths:
            name = osp.basename(gt_path)
            paths.append({
                f"{lq_key}_path": osp.join(lq_folder, name),
                f"{gt_key}_path": gt_path,
                f"{ref_key}_path": osp.join(ref_folder, name),
            })
    else:
        assert len(lq_paths) == len(gt_paths) == len(ref_paths), (
            f"counts differ: {len(lq_paths)}, {len(gt_paths)}, "
            f"{len(ref_paths)}")
        for l, g, r in zip(lq_paths, gt_paths, ref_paths):
            paths.append({f"{lq_key}_path": l, f"{gt_key}_path": g,
                          f"{ref_key}_path": r})
    return paths


def _lmdb_keys(folder: str) -> list[str]:
    """Keys of a BasicSR-style lmdb folder: meta_info.txt lines are
    'name.ext (h,w,c) level'; the lmdb key is the name without extension
    (reference data/utils_data.py:116-156).  Falls back to a B-tree scan
    via the pure-Python parser when the sidecar is missing."""
    meta = osp.join(folder, "meta_info.txt")
    if osp.exists(meta):
        with open(meta) as f:
            return [line.split(".")[0] for line in f if line.strip()]
    from textualdegremoval_tpu.data.lmdb_reader import PurePythonLmdb

    return PurePythonLmdb(folder).keys()


def paired_paths_from_lmdb(folders, keys):
    """lq/gt pairing by identical lmdb keys (reference
    data/utils_data.py:94-160).  Returned '{key}_path' entries are lmdb
    keys, resolved by the FileClient lmdb backend."""
    in_folder, gt_folder = folders
    in_key, gt_key = keys
    if not (in_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError(
            f"{in_key} and {gt_key} folders should both be .lmdb: "
            f"{in_folder}, {gt_folder}")
    in_keys, gt_keys = set(_lmdb_keys(in_folder)), set(_lmdb_keys(gt_folder))
    if in_keys != gt_keys:
        raise ValueError(
            f"keys in {in_key} and {gt_key} lmdbs differ "
            f"(e.g. {sorted(in_keys ^ gt_keys)[:3]})")
    return [{f"{in_key}_path": k, f"{gt_key}_path": k}
            for k in sorted(in_keys)]


def tri_paths_from_lmdb(folders, keys):
    """lq/gt/ref pairing by identical lmdb keys (WithRef extension of the
    reference's paired_paths_from_lmdb)."""
    sets = {key: set(_lmdb_keys(folder))
            for folder, key in zip(folders, keys)}
    base = sets[keys[0]]
    for k, s in sets.items():
        if s != base:
            raise ValueError(
                f"keys in {keys[0]} and {k} lmdbs differ "
                f"(e.g. {sorted(base ^ s)[:3]})")
    return [{f"{k}_path": key for k in keys} for key in sorted(base)]


def paths_from_meta_info(meta_file: str, folders, keys):
    """Dehaze-style meta_info mapping: each line 'lq_name gt_name'
    (reference Dataset_PairedDehazeWithRef semantics)."""
    lq_folder, gt_folder, ref_folder = folders
    lq_key, gt_key, ref_key = keys
    paths = []
    with open(meta_file) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            lq_name = parts[0]
            gt_name = parts[1] if len(parts) > 1 else parts[0]
            paths.append({
                f"{lq_key}_path": osp.join(lq_folder, lq_name),
                f"{gt_key}_path": osp.join(gt_folder, gt_name),
                f"{ref_key}_path": osp.join(ref_folder, lq_name),
            })
    return paths
