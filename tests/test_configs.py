"""Every shipped task config must parse and resolve through the registries.

The reference ships 20 task YAMLs under options/train_restoration/
(001..019 + 004_1); our surface carries the same tasks (plus the SPA derain
variant the 200L_SPA arch file implies).  Each file must:

* parse through utils/options.py,
* name a registered model_type,
* name a registered dataset type for train and val,
* instantiate its network_g through define_network (constructor-kwarg
  compatibility with the reference YAML surface, SURVEY §2.2 config rows).
"""

import glob
import os

import pytest

from textualdegremoval_tpu.utils.options import parse
from textualdegremoval_tpu.models import define_network
from textualdegremoval_tpu.train.model_registry import _MODEL_TYPES
from textualdegremoval_tpu.data import _DATASETS

OPT_DIR = os.path.join(os.path.dirname(__file__), "..", "options",
                       "train_restoration")
CONFIGS = sorted(glob.glob(os.path.join(OPT_DIR, "*.yml")))

# reference option inventory (names normalized to task keys)
REFERENCE_TASKS = {
    "promptir_all_in_one": "001",
    "nafnet_motion_deblur": "002",
    "restormer_motion_deblur": "003",
    "restormer_defocus_dual_pixel_16bit": "004_0",
    "restormer_defocus_single_8bit": "004_1",
    "sfnet_dehaze_indoor": "005",
    "sfnet_dehaze_outdoor": "006",
    "drsformer_derain_rain200l": "007",
    "drsformer_derain_rain200h": "008",
    "drsformer_derain_did": "009",
    "drsformer_derain_dnd": "010",
    "restormer_gaussian_gray_denoise_blind": "011",
    "restormer_gaussian_gray_denoise_15": "012",
    "restormer_gaussian_gray_denoise_25": "013",
    "restormer_gaussian_gray_denoise_50": "014",
    "restormer_gaussian_color_denoise_blind": "015",
    "restormer_gaussian_color_denoise_15": "016",
    "restormer_gaussian_color_denoise_25": "017",
    "restormer_gaussian_color_denoise_50": "018",
    "restormer_realworld_denoise": "019",
}


def test_all_reference_tasks_covered():
    names = {os.path.splitext(os.path.basename(p))[0] for p in CONFIGS}
    missing = set(REFERENCE_TASKS) - names
    assert not missing, f"task configs missing vs reference: {sorted(missing)}"
    assert len(CONFIGS) >= 20


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_resolves(path):
    opt = parse(path, is_train=True)
    assert opt["model_type"] in _MODEL_TYPES
    for phase in ("train", "val"):
        assert phase in opt["datasets"], f"{phase} dataset section missing"
        dtype = opt["datasets"][phase]["type"]
        assert dtype in _DATASETS, f"unknown dataset type {dtype}"
    net = define_network(opt["network_g"])
    assert net is not None
    # progressive schedule consistency (train CLI relies on it)
    tr = opt["datasets"]["train"]
    if "mini_batch_sizes" in tr:
        assert len(tr["mini_batch_sizes"]) == len(tr["iters"])
        assert len(tr["gt_sizes"]) == len(tr["iters"])
    # scheduler resolvable
    sched = opt["train"]["scheduler"]
    assert sched["type"] in (
        "CosineAnnealingRestartCyclicLR", "MultiStepLR",
        "CosineAnnealingWarmupRestarts", "CosineAnnealingLRWithRestart",
        "MultiStepRestartLR", "LinearLR", "VibrateLR",
        "CosineAnnealingRestartLR")
