"""Lossless Flax -> PyTorch checkpoint conversion (the reverse of
torch_to_jax).

Why a reverse path exists: the 0.05 dB parity gate (BASELINE.json) requires
checkpoints to convert *losslessly* from the reference; the only way to
prove the torch->flax mapping drops nothing is a round trip — torch sd ->
flax tree -> torch sd, bitwise on every key.  It also lets models trained
in this framework be exported for the reference's own eval scripts
(scripts/eval/*.py load ``{'params': state_dict}``, base_model.py:213-244).

The forward mapping's key rewrites are many-to-one and therefore not
invertible in closed form; instead the reverse conversion is driven by a
torch *template* state dict (the original checkpoint, or a freshly
constructed reference net's ``state_dict()``): each torch key is
forward-mapped to its flax path, the flax leaf is looked up, and the array
transform is inverted.  Dead reference params (declared but unused in any
forward pass — dropped by the forward conversion) are filled from the
template so the output is loadable by the reference with strict=True.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import flax.traverse_util as traverse_util

from textualdegremoval_tpu.convert.torch_to_jax import (
    _DEAD_KEYS,
    _convert_leaf,
    _is_conv_transpose,
    _torch_key_to_flax_path,
)


def _to_np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _invert_array(flax_path: tuple[str, ...], arr: np.ndarray,
                  torch_leaf: str, torch_ndim: int) -> np.ndarray:
    """Invert _convert_leaf's array transform for one leaf."""
    arr = np.asarray(arr)
    if torch_leaf == "weight":
        if torch_ndim == 4:
            if _is_conv_transpose(flax_path):
                # forward: IOHW -> HWIO + spatial flip; invert both
                return np.ascontiguousarray(
                    arr[::-1, ::-1].transpose(2, 3, 0, 1))
            return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
        if torch_ndim == 2:
            return np.ascontiguousarray(arr.T)
        return arr
    if torch_leaf in ("beta", "gamma") and torch_ndim == 4:
        return np.ascontiguousarray(arr.transpose(0, 3, 1, 2))
    if torch_leaf == "prompt_param" and torch_ndim == 5:
        return np.ascontiguousarray(arr.transpose(0, 1, 4, 2, 3))
    return arr


def convert_params_to_torch(
    variables: Mapping[str, Any],
    template_sd: Mapping[str, Any],
    strict: bool = True,
) -> dict[str, np.ndarray]:
    """Flax variables -> torch state dict with exactly template_sd's keys.

    Args:
      variables: ``{'params': tree}`` or ``{'params': ..., 'batch_stats':
        ...}`` (model.init / converted form), or a bare params tree.
      template_sd: torch (key -> tensor/ndarray) providing the target key
        set, shapes, and the values of dead (unconverted) parameters.
      strict: raise if any flax leaf goes unused or any torch key cannot be
        resolved; False downgrades to skipping (for partial exports).
    Returns:
      key -> numpy array, same dtype/shape as the template entries.
    """
    if "params" in variables and not any(
            k not in ("params", "batch_stats") for k in variables):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    else:
        params, batch_stats = variables, {}

    flat = dict(traverse_util.flatten_dict(params))
    for path, v in traverse_util.flatten_dict(batch_stats).items():
        # split_batch_stats moved running_mean/var -> mean/var; undo
        leaf = {"mean": "running_mean", "var": "running_var"}.get(
            path[-1], path[-1])
        flat[path[:-1] + (leaf,)] = v

    out: dict[str, np.ndarray] = {}
    used: set[tuple[str, ...]] = set()
    problems: list[str] = []
    for key, tpl in template_sd.items():
        tpl = _to_np(tpl)
        if any(p.search(key) for p in _DEAD_KEYS):
            out[key] = tpl  # dead param: carried through unchanged
            continue
        path = _torch_key_to_flax_path(key)
        if path[-1] == "num_batches_tracked":
            out[key] = tpl  # counter, no flax analogue
            continue
        flax_path, _ = _convert_leaf(path, tpl)
        if flax_path not in flat:
            problems.append(f"no flax leaf for {key} (-> {'/'.join(flax_path)})")
            continue
        used.add(flax_path)
        arr = _invert_array(flax_path, np.asarray(flat[flax_path]),
                            path[-1], tpl.ndim)
        if arr.shape != tpl.shape:
            problems.append(
                f"shape mismatch for {key}: flax {arr.shape} vs "
                f"template {tpl.shape}")
            continue
        out[key] = arr.astype(tpl.dtype, copy=False)

    unused = set(flat) - used
    if unused:
        problems.extend(
            f"flax leaf unused: {'/'.join(k)}" for k in sorted(
                unused, key="/".join))
    if problems and strict:
        raise ValueError(
            "jax->torch conversion not lossless:\n  " + "\n  ".join(problems))
    return out


def convert_mapper_to_torch(params: Mapping[str, Any], num_words: int,
                            prefix: str = "mapping",
                            with_patch: bool = True,
                            global_kv: Mapping[str, Mapping[str, Any]]
                            | None = None) -> dict[str, np.ndarray]:
    """Inverse of tower_maps.convert_mapper (+ global K/V re-attachment):
    our stacked WordMLPs tree -> the reference ``mapper_<step>.pt`` layout
    (per-word Sequentials ``mapping_{i}.{0,1,3,4,6,7,9}``, plus
    ``<layer>_to_k/v.weight`` attributes, main_train_i2t_mapping.py:40-81,
    573-612).  The mappers are the trainable pipeline-A artifacts, so this
    is the export path for mappers trained in this framework; the frozen SD
    towers never need exporting (their source checkpoints are canonical).
    """
    from textualdegremoval_tpu.convert.tower_maps import (
        _SEQ_LINEARS, _SEQ_LNS,
    )

    flat = {"/".join(k): np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}
    out: dict[str, np.ndarray] = {}
    branches = [prefix] + ([f"{prefix}_patch"] if with_patch else [])
    for branch in branches:
        dst = "mapping_patch" if branch.endswith("_patch") else "mapping"
        for seq_i, name in _SEQ_LINEARS.items():
            w = flat[f"{dst}/{name}_kernel"]  # (num_words, in, out)
            b = flat[f"{dst}/{name}_bias"]
            for i in range(num_words):
                out[f"{branch}_{i}.{seq_i}.weight"] = np.ascontiguousarray(
                    w[i].T)
                out[f"{branch}_{i}.{seq_i}.bias"] = b[i]
        for seq_i, name in _SEQ_LNS.items():
            w = flat[f"{dst}/{name}_weight"]
            b = flat[f"{dst}/{name}_bias"]
            for i in range(num_words):
                out[f"{branch}_{i}.{seq_i}.weight"] = w[i]
                out[f"{branch}_{i}.{seq_i}.bias"] = b[i]
    if global_kv:
        for layer_path, kv in global_kv.items():
            for which, wmat in kv.items():  # 'to_k'/'to_v', (in, out)
                out[f"{layer_path}_{which}.weight"] = np.ascontiguousarray(
                    np.asarray(wmat).T)
    return out


def save_torch_checkpoint(variables, template_sd, path: str,
                          ema_variables=None) -> None:
    """Write a reference-format ``net_g_*.pth``: ``{'params': sd}`` plus
    ``'params_ema'`` when EMA variables are given (base_model.py:213-244)."""
    import torch

    ckpt = {"params": {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in convert_params_to_torch(variables, template_sd).items()
    }}
    if ema_variables is not None:
        ckpt["params_ema"] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in convert_params_to_torch(
                ema_variables, template_sd).items()
        }
    torch.save(ckpt, path)
