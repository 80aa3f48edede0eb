"""End-to-end smoke test of the restoration training CLI on synthetic data:
YAML config -> dataloader -> model -> a few optimization steps -> checkpoint
saved -> auto-resume."""

import os

import numpy as np
import cv2
import yaml
import jax
import pytest

pytestmark = pytest.mark.slow  # end-to-end/full-net: minutes on CPU


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ws")
    rng = np.random.default_rng(0)
    for sub in ("lq", "hq", "ref"):
        (root / sub).mkdir()
    for i in range(4):
        img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        for sub in ("lq", "hq", "ref"):
            cv2.imwrite(str(root / sub / f"img_{i:02d}.png"), img)

    opt = {
        "name": "smoke_debugless",
        "model_type": "RefGuidedImageCleanModel",
        "scale": 1,
        "manual_seed": 7,
        "datasets": {
            "train": {
                "name": "T", "type": "Dataset_PairedImageWithRef",
                "lqroot": str(root / "lq"), "hqroot": str(root / "hq"),
                "refroot": str(root / "ref"), "geometric_augs": True,
                "use_shuffle": True, "num_worker_per_gpu": 1,
                "batch_size_per_gpu": 2, "mini_batch_sizes": [2],
                "iters": [1000], "gt_size": 32, "gt_sizes": [32],
            },
        },
        "network_g": {
            "type": "RestormerRefFusion", "dim": 8,
            "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
            "heads": [1, 1, 2, 2], "ffn_expansion_factor": 2.66,
            "bias": False, "LayerNorm_type": "WithBias", "nf": 8,
            "ext_n_blocks": [1, 1, 1, 1], "reffusion_n_blocks": [1, 1, 1, 1],
            "lr_block_size": 4,
        },
        "path": {"pretrain_dino": None, "pretrain_network_g": None,
                 "resume_state": None},
        "train": {
            "total_iter": 4, "warmup_iter": -1, "use_grad_clip": True,
            "param_fix_iterations": 1,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [2, 2], "restart_weights": [1, 1],
                          "eta_mins": [0.0003, 0.000001]},
            "optim_g": {"type": "AdamW", "lr": 2.0e-4, "ref_lr": 1.0e-4,
                        "weight_decay": 1.0e-4, "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                          "reduction": "mean"},
        },
        "val": {"val_freq": 100, "max_minibatch": 1},
        "logger": {"check_freq": 100, "print_freq": 2,
                   "save_checkpoint_freq": 4},
    }
    cfg = root / "opt.yml"
    cfg.write_text(yaml.dump(opt))
    return root, str(cfg)


class TestTrainCLI:
    def test_few_steps_and_checkpoint(self, workspace, monkeypatch):
        root, cfg = workspace
        monkeypatch.chdir(root)
        from textualdegremoval_tpu.cli.train_restoration import main

        state = main(["--opt", cfg, "--max_iters", "4"])
        assert int(state.step) == 4
        states_dir = root / "experiments" / "smoke_debugless" / \
            "training_states"
        assert any(d.startswith("state_") for d in os.listdir(states_dir))

    def test_auto_resume(self, workspace, monkeypatch):
        root, cfg = workspace
        monkeypatch.chdir(root)
        from textualdegremoval_tpu.cli.train_restoration import main

        state = main(["--opt", cfg, "--max_iters", "6"])
        # resumed from 4, ran to 6
        assert int(state.step) == 6

    def test_bf16_remat_flags_end_to_end(self, workspace, monkeypatch,
                                         tmp_path):
        # the measured-feasible 384px protocol path (bf16 + remat) runs
        # from the product CLI (fresh experiment name so no auto-resume)
        root, cfg = workspace
        monkeypatch.chdir(root)
        import yaml as _yaml
        opt = _yaml.safe_load(open(cfg))
        opt["name"] = "smoke_bf16_remat"
        cfg2 = tmp_path / "opt_bf16.yml"
        cfg2.write_text(_yaml.dump(opt))
        from textualdegremoval_tpu.cli.train_restoration import main

        state = main(["--opt", str(cfg2), "--max_iters", "2",
                      "--mixed_precision", "bf16", "--remat"])
        assert int(state.step) == 2
        import numpy as np
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))


class TestTrainCLINAFNet:
    def test_nafnet_family_through_cli(self, tmp_path, monkeypatch):
        """Second arch family through the full CLI (different padder/fusion
        wiring than Restormer)."""
        import numpy as np
        import cv2
        import yaml

        rng = np.random.default_rng(1)
        for sub in ("lq", "hq", "ref"):
            (tmp_path / sub).mkdir()
        for i in range(4):
            img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
            for sub in ("lq", "hq", "ref"):
                cv2.imwrite(str(tmp_path / sub / f"im_{i}.png"), img)
        opt = {
            "name": "naf_smoke_debugless", "model_type": "RefGuidedImageCleanModel",
            "scale": 1, "manual_seed": 3,
            "datasets": {"train": {
                "name": "T", "type": "Dataset_PairedImageWithRef",
                "lqroot": str(tmp_path / "lq"), "hqroot": str(tmp_path / "hq"),
                "refroot": str(tmp_path / "ref"), "geometric_augs": True,
                "num_worker_per_gpu": 1, "batch_size_per_gpu": 1,
                "mini_batch_sizes": [1], "iters": [100], "gt_size": 32,
                "gt_sizes": [32]}},
            "network_g": {
                "type": "NAFNetRefFusion", "img_channel": 3, "width": 8,
                "middle_blk_num": 1, "enc_blk_nums": [1, 1],
                "dec_blk_nums": [1, 1], "nf": 8, "ext_n_blocks": [1, 1, 1],
                "reffusion_n_blocks": [1, 1, 1],
                "reffusion_n_blocks_middle": 1, "lr_block_size": 4},
            "path": {"pretrain_dino": None, "pretrain_network_g": None,
                     "resume_state": None},
            "train": {
                "total_iter": 2, "warmup_iter": -1, "use_grad_clip": True,
                "param_fix_iterations": 0,
                "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                              "periods": [1, 1], "restart_weights": [1, 1],
                              "eta_mins": [0.0003, 0.000001]},
                "optim_g": {"type": "AdamW", "lr": 2.0e-4,
                            "weight_decay": 1.0e-4, "betas": [0.9, 0.999]},
                "pixel_opt": {"type": "PSNRLoss", "loss_weight": 1,
                              "reduction": "mean"}},
            "val": {"val_freq": 100},
            "logger": {"check_freq": 100, "print_freq": 1,
                       "save_checkpoint_freq": 100},
        }
        cfg = tmp_path / "naf.yml"
        cfg.write_text(yaml.dump(opt))
        monkeypatch.chdir(tmp_path)
        from textualdegremoval_tpu.cli.train_restoration import main

        state = main(["--opt", str(cfg), "--max_iters", "2"])
        assert int(state.step) == 2
