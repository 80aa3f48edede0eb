"""End-to-end smoke of the DiffIR text-embed training CLI: YAML ->
dataloader -> frozen CLIP+mapper embed -> NAFNetDynamicFusion steps ->
checkpoint -> auto-resume (mirrors test_cli_train for the DiffIR trainer,
reference image_restoration_text_embed_diffir_model.py:105-533)."""

import os

import numpy as np
import cv2
import yaml
import pytest

pytestmark = pytest.mark.slow  # end-to-end: minutes on CPU


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("diffir_ws")
    rng = np.random.default_rng(0)
    for sub in ("lq", "hq", "ref"):
        (root / sub).mkdir()
    for i in range(4):
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        for sub in ("lq", "hq", "ref"):
            cv2.imwrite(str(root / sub / f"img_{i:02d}.png"), img)

    opt = {
        "name": "smoke_diffir",
        "model_type": "DiffIRRefGuidedImageCleanModel",
        "scale": 1,
        "manual_seed": 7,
        "datasets": {
            "train": {
                "name": "T", "type": "Dataset_PairedImageWithRef",
                "lqroot": str(root / "lq"), "hqroot": str(root / "hq"),
                "refroot": str(root / "ref"), "geometric_augs": True,
                "use_shuffle": True, "num_worker_per_gpu": 1,
                "batch_size_per_gpu": 2, "gt_size": 32,
            },
        },
        # tiny frozen towers (random-init smoke; real runs point
        # path.pretrain_clip_vision / pretrain_mapper at checkpoints)
        "network_clip": {"image_size": 28, "patch_size": 14, "width": 32,
                         "layers": 1, "heads": 2},
        "network_mapper": {"num_words": 6, "input_dim": 32,
                           "output_dim": 1024},
        "network_g": {
            "type": "NAFNetDynamicFusion", "width": 8,
            "middle_blk_num": 1, "enc_blk_nums": [1],
            "dec_blk_nums": [1],
        },
        "path": {"pretrain_network_g": None, "resume_state": None},
        "train": {
            "total_iter": 4, "warmup_iter": -1, "use_grad_clip": True,
            "ema_decay": 0.9,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [2, 2], "restart_weights": [1, 1],
                          "eta_mins": [0.0003, 0.000001]},
            "optim_g": {"type": "AdamW", "lr": 2.0e-4,
                        "weight_decay": 1.0e-4, "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                          "reduction": "mean"},
        },
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
    }
    cfg = root / "opt.yml"
    cfg.write_text(yaml.dump(opt))
    return root, str(cfg)


class TestDiffIRCLI:
    def test_few_steps_and_checkpoint(self, workspace, monkeypatch):
        root, cfg = workspace
        monkeypatch.chdir(root)
        from textualdegremoval_tpu.cli.train_diffir import main

        state = main(["--opt", cfg, "--max_iters", "4"])
        assert int(state.step) == 4
        assert state.ema_params is not None  # ema_decay 0.9 in YAML
        exp = root / "experiments" / "smoke_diffir"
        states = exp / "training_states"
        assert any(d.startswith("state_") for d in os.listdir(states))

    def test_auto_resume(self, workspace, monkeypatch):
        root, cfg = workspace
        monkeypatch.chdir(root)
        from textualdegremoval_tpu.cli.train_diffir import main

        state = main(["--opt", cfg, "--max_iters", "6"])
        assert int(state.step) == 6
