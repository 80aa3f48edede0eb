"""Lossless PyTorch -> Flax checkpoint conversion for the restoration nets.

The reference saves networks as ``{'params': state_dict}`` (+ optional
``'params_ema'``) with possible ``module.`` DDP prefixes
(models/base_model.py:213-244).  This module maps those keys onto our Flax
module tree:

* torch ``a.b.3.c``      -> flax ``a/b_3/c``   (sequential index merging)
* conv  ``weight`` OIHW  -> ``kernel`` HWIO    (depthwise included)
* linear ``weight`` (o,i)-> ``kernel`` (i,o)
* LayerNorm wrappers (``norm1.body.*``), Down/Upsample sequentials
  (``body.0``), SCA sequentials (``sca.1``), NAFNet up convs (``ups.N.0``)
  are flattened to our explicit names.
* NAFNet ``beta``/``gamma`` (1,C,1,1) -> (1,1,1,C).

Conversion is pure numpy — no torch import needed if the caller already has
numpy arrays; ``load_torch_checkpoint`` handles ``.pth`` reading.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

import flax.traverse_util as traverse_util

# Reference params that are declared but never used in any forward pass —
# dropped at conversion (keeping them would fail strict key matching against
# our nets, which only declare live parameters):
# * PromptIR chnl_reduce1/2/3 + reduce_noise_channel_1/2/3
#   (network_promptir_guided_arch.py:468-470,472-486: built, never called)
# * SFNet dynamic_filter.lamb_l/.lamb_h (sfnet_arch_utils.py:159-160)
_DEAD_KEYS = [
    re.compile(r"\bchnl_reduce\d\."),
    re.compile(r"\breduce_noise_channel_\d\."),
    re.compile(r"\.lamb_[lh]$"),
]


# DRSformer MEFC (subnet/OALayer/GroupOLs/OperationLayer,
# network_drsformer_guided_arch.py:371-547) -> our MEFC module names.
_MEFC_OPNAMES = ["sep_conv_1x1", "sep_conv_3x3", "sep_conv_5x5",
                 "sep_conv_7x7", "dil_conv_3x3", "dil_conv_5x5",
                 "dil_conv_7x7"]  # op 7 = avg_pool (parameter-free)
_MEFC_SEP_LEAF = {0: "dw1", 1: "pw1", 3: "dw2", 4: "pw2"}  # 2 is the ReLU
_MEFC_DIL_LEAF = {0: "dw", 1: "pw"}


def _mefc_op_sub(m: re.Match) -> str:
    step, op_j, seq_k = m.group(1), int(m.group(2)), int(m.group(3))
    leaf = (_MEFC_SEP_LEAF if op_j < 4 else _MEFC_DIL_LEAF)[seq_k]
    return f".ops_{step}.{_MEFC_OPNAMES[op_j]}.{leaf}."


# order matters: structural rewrites before index merging
_REWRITES = [
    # DRSformer MEFC structure flattening (subnet with layer_num=1)
    (re.compile(r"\.layers\.0\.ca_fc\.0\."), ".ca_fc1."),
    (re.compile(r"\.layers\.0\.ca_fc\.2\."), ".ca_fc2."),
    (re.compile(r"\.layers\.1\.preprocess\.op\.0\."), ".preprocess."),
    (re.compile(r"\.layers\.1\._ops\.(\d+)\._ops\.(\d+)\.op\.(\d+)\."),
     _mefc_op_sub),
    (re.compile(r"\.layers\.1\._ops\.(\d+)\._out\.0\."), r".ops_\1.out."),
    (re.compile(r"^module\."), ""),
    (re.compile(r"\.body\.0\.(weight|bias)$"), r".conv.\1"),  # Down/Upsample
    (re.compile(r"(norm\d?|norm)\.body\."), r"\1."),  # Restormer LN wrapper
    (re.compile(r"\.sca\.1\."), ".sca.conv."),  # NAFNet SCA sequential
    (re.compile(r"\.ups\.(\d+)\.0\."), r".ups.\1."),  # NAFNet up conv
    (re.compile(r"^ups\.(\d+)\.0\."), r"ups.\1."),
    # SFNet BasicConv Sequential (conv[, GELU]), SCM InstanceNorm, FAM merge
    (re.compile(r"\.main\.4\.(weight|bias)$"), r".norm.\1"),
    (re.compile(r"\.main\.0\.(weight|bias)$"), r".conv.\1"),
    (re.compile(r"\.merge\."), "."),
    # DiffIR NAFNetDynamicFusion: strip the DynamicBasicLayer wrapper
    # (scoped to lowercase encoders/decoders/middle_blks so SFNet's
    # EBlock `layers` sequentials are untouched) and map the
    # Sequential(Linear) conditioning heads (gate heads first, then the
    # block-entry `kernel` -> our affine_in)
    (re.compile(r"\b(encoders|decoders)\.(\d+)\.layers\."), r"\1.\2."),
    (re.compile(r"\bmiddle_blks\.layers\."), "middle_blks."),
    (re.compile(r"\.sg([12])\.kernel\.0\.weight$"), r".sg\1.kernel.weight"),
    (re.compile(r"\.kernel\.0\.weight$"), r".affine_in.kernel.weight"),
]

# leaves that are parameters of our hand-rolled modules (keep name 'weight')
_LN_LEAVES = {"weight", "bias"}
_PASSTHROUGH_LEAVES = {"temperature", "alpha", "attn1", "attn2", "attn3", "attn4"}


def _torch_key_to_flax_path(key: str) -> tuple[str, ...]:
    for pat, rep in _REWRITES:
        key = pat.sub(rep, key)
    segs = key.split(".")
    merged: list[str] = []
    for s in segs:
        if s.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{s}"
        else:
            merged.append(s)
    return tuple(merged)


# torch modules whose 'weight' is a ConvTranspose2d (in, out, kh, kw) and
# must flip spatially for flax.nn.ConvTranspose: SFNet's two up convs
# (network_sfnet_guided_arch feat_extract[3]/[4]).
_CONV_TRANSPOSE_PATTERNS = (re.compile(r"feat_extract_[34]\b"),)


def _is_conv_transpose(path: tuple[str, ...]) -> bool:
    joined = "/".join(path)
    return any(p.search(joined) for p in _CONV_TRANSPOSE_PATTERNS)


def _convert_leaf(path: tuple[str, ...], arr: np.ndarray):
    """Returns (new_path, new_array)."""
    leaf = path[-1]
    if leaf == "weight":
        if arr.ndim == 4:
            if _is_conv_transpose(path):
                # ConvTranspose IOHW -> HWIO + spatial flip (verified
                # equivalent to torch k4/s2/p1 semantics)
                k = arr.transpose(2, 3, 0, 1)[::-1, ::-1]
                return path[:-1] + ("kernel",), np.ascontiguousarray(k)
            return path[:-1] + ("kernel",), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # linear (o,i) -> (i,o)
            return path[:-1] + ("kernel",), arr.T
        # 1-D weight: flax GroupNorm/BatchNorm ('norm'/'bn' modules) call it
        # 'scale'; our hand-rolled layer-norms keep 'weight'
        if len(path) >= 2 and path[-2] in ("norm", "bn"):
            return path[:-1] + ("scale",), arr
        return path, arr
    if leaf in ("beta", "gamma") and arr.ndim == 4:
        # NAFNet residual scales (1,C,1,1) -> (1,1,1,C)
        return path, arr.transpose(0, 2, 3, 1)
    if leaf == "prompt_param" and arr.ndim == 5:
        # PromptIR prompt bank (1, L, D, S, S) -> (1, L, S, S, D)
        return path, arr.transpose(0, 1, 3, 4, 2)
    return path, arr


def convert_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Convert a torch (name -> tensor/ndarray) dict to a nested Flax params
    tree (the value for the 'params' collection)."""
    flat = {}
    for k, v in state_dict.items():
        if any(p.search(k) for p in _DEAD_KEYS):
            continue
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        path = _torch_key_to_flax_path(k)
        path, arr = _convert_leaf(path, arr)
        flat[path] = arr
    return traverse_util.unflatten_dict(flat)


def load_torch_checkpoint(path: str, key: str = "params",
                          strict_key: bool = False) -> dict:
    """Read a reference ``net_g_*.pth`` and return Flax params.

    ``key`` selects 'params' or 'params_ema' (reference
    base_model.py:281-309 semantics, including raw state dicts without the
    wrapper).  With ``strict_key`` a missing wrapper key raises KeyError
    instead of treating the whole file as a raw state dict — used when the
    caller needs to distinguish "no params_ema saved" from "raw dict"."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    elif strict_key:
        raise KeyError(f"{key!r} not in checkpoint {path}")
    return convert_state_dict(ckpt)


def verify_against_init(converted: dict, init_params: dict) -> list[str]:
    """Compare a converted tree against a freshly initialized one; returns a
    list of human-readable mismatch descriptions (empty == exact match),
    mirroring the reference's lenient key-diff logging
    (base_model.py:246-279)."""
    a = traverse_util.flatten_dict(converted)
    b = traverse_util.flatten_dict(init_params)
    msgs = []
    for k in sorted(set(a) | set(b), key="/".join):
        if k not in a:
            msgs.append(f"missing in checkpoint: {'/'.join(k)} {b[k].shape}")
        elif k not in b:
            msgs.append(f"unexpected in checkpoint: {'/'.join(k)} {a[k].shape}")
        elif tuple(a[k].shape) != tuple(b[k].shape):
            msgs.append(
                f"shape mismatch {'/'.join(k)}: ckpt {a[k].shape} vs "
                f"model {b[k].shape}"
            )
    return msgs


def split_batch_stats(tree: dict) -> dict:
    """Split a converted tree into Flax variable collections.

    BatchNorm running statistics live in the torch state dict alongside
    parameters; Flax keeps them in a separate ``batch_stats`` collection.
    Returns ``{'params': ..., 'batch_stats': ...}`` (``batch_stats`` omitted
    when the net has none).  ``num_batches_tracked`` counters are dropped.
    """
    flat = traverse_util.flatten_dict(tree)
    params, stats = {}, {}
    for k, v in flat.items():
        if k[-1] in ("running_mean", "running_var"):
            stats[k[:-1] + ("mean" if k[-1] == "running_mean" else "var",)] = v
        elif k[-1] == "num_batches_tracked":
            continue
        else:
            params[k] = v
    out = {"params": traverse_util.unflatten_dict(params)}
    if stats:
        out["batch_stats"] = traverse_util.unflatten_dict(stats)
    return out
