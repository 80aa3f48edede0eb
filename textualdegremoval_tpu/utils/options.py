"""YAML option parsing, preserving the reference config surface.

Parity: reference utils/utils_options.py:31-89 — same conventions:
* `model_type` / `network_g.type` / dataset `type` registry names;
* experiment dir layout derived from `name` (experiments/<name>/models,
  training_states, visualization, log);
* any name containing 'debug' rewires val/log/save frequencies to 8 iters.

Reference YAML files under options/train_restoration/ parse unchanged.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any

import yaml


def _yaml_load(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def parse(opt_path: str, is_train: bool = True, root: str | None = None) -> dict:
    opt = _yaml_load(opt_path)
    opt["is_train"] = is_train

    # dataset phase tagging + scale propagation
    scale = opt.get("scale", 1)
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        dataset["scale"] = scale

    root = root or os.getcwd()
    name = opt.get("name", "exp")
    if is_train:
        exp_root = osp.join(root, "experiments", name)
        opt.setdefault("path", {})
        opt["path"].update({
            "experiments_root": exp_root,
            "models": osp.join(exp_root, "models"),
            "training_states": osp.join(exp_root, "training_states"),
            "log": exp_root,
            "visualization": osp.join(exp_root, "visualization"),
        })
        if "debug" in name:
            for k in ("val",):
                if k in opt:
                    opt[k]["val_freq"] = 8
            if "logger" in opt:
                opt["logger"]["print_freq"] = 1
                opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(root, "results", name)
        opt.setdefault("path", {})
        opt["path"].update({
            "results_root": results_root,
            "log": results_root,
            "visualization": osp.join(results_root, "visualization"),
        })
    return opt


def dict2str(opt: dict, indent: int = 1) -> str:
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent * 2) + f"{k}:\n" + dict2str(v, indent + 1)
        else:
            msg += " " * (indent * 2) + f"{k}: {v}\n"
    return msg
