"""4-process data-parallel training through the REAL train CLI (VERDICT r2
item 9 — beyond the 2-process bootstrap unit test).

Each process runs ``cli/train_restoration.main`` under torch-launcher-style
env (the reference's `python -m torch.distributed.launch` surface,
README.md:116), on a 4-way CPU mesh (1 device per process, gloo
collectives).  The dataset is four identical images with gt_size == image
size and no augs, so the global batch is deterministic and identical
between the 4-process run and a single-process run with 4 virtual devices —
the in-step global-mean loss must match across all ranks AND match the
single-process run.

Also asserts the 4-way EnlargedSampler shards are disjoint per epoch.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _make_workspace(tmp_path):
    import cv2
    import yaml

    img = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
        np.uint8)
    for sub in ("lq", "hq", "ref"):
        (tmp_path / sub).mkdir()
        for i in range(4):
            cv2.imwrite(str(tmp_path / sub / f"img_{i}.png"), img)
    opt = {
        "name": "multihost4",  # no 'debug': keep the configured freqs
        "model_type": "RefGuidedImageCleanModel", "scale": 1,
        "manual_seed": 7,
        "datasets": {"train": {
            "name": "T", "type": "Dataset_PairedImageWithRef",
            "lqroot": str(tmp_path / "lq"), "hqroot": str(tmp_path / "hq"),
            "refroot": str(tmp_path / "ref"), "geometric_augs": False,
            "use_shuffle": True, "num_worker_per_gpu": 1,
            "batch_size_per_gpu": 1, "mini_batch_sizes": [1],
            "iters": [1000], "gt_size": 32, "gt_sizes": [32],
        }},
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
            "total_iter": 1, "warmup_iter": -1, "use_grad_clip": True,
            "param_fix_iterations": 0,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [2, 2], "restart_weights": [1, 1],
                          "eta_mins": [0.0003, 0.000001]},
            "optim_g": {"type": "AdamW", "lr": 2.0e-4, "ref_lr": 1.0e-4,
                        "weight_decay": 1.0e-4, "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                          "reduction": "mean"},
        },
        "val": {"val_freq": 1000},
        "logger": {"check_freq": 0, "print_freq": 1,
                   "save_checkpoint_freq": 1000},
    }
    cfg = tmp_path / "opt.yml"
    cfg.write_text(yaml.dump(opt))
    return str(cfg)


def _run_cli(cfg, workdir, env_extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
                # share compiled programs across the 5 spawned processes —
                # this host has ONE core, so duplicate compiles serialize
                "JAX_COMPILATION_CACHE_DIR": "/tmp/tdr_jax_cache"})
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-m", "textualdegremoval_tpu.cli.train_restoration",
         "--opt", cfg, "--max_iters", "1"],
        env=env, cwd=workdir, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


_LPIX = re.compile(r"l_pix: ([0-9.e+-]+)")


def test_four_process_cli_matches_single_process(tmp_path):
    cfg = _make_workspace(tmp_path)
    (tmp_path / "run4").mkdir()
    (tmp_path / "run1").mkdir()

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        _run_cli(cfg, str(tmp_path / "run4"), {
            "RANK": str(rank), "WORLD_SIZE": "4",
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
        })
        for rank in range(4)
    ]
    # 4 concurrent tiny-model compiles serialize on this 1-core host; the
    # first communicate() bears the whole concurrent wait
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
    # rank-0 logs the (globally pmean'd) loss
    losses4 = [float(m) for m in _LPIX.findall(outs[0])]
    assert losses4, f"no l_pix logged:\n{outs[0][-3000:]}"

    # single process, 4 virtual devices, same global batch of 4
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/tdr_jax_cache",
    })
    for k in ("RANK", "WORLD_SIZE", "MASTER_ADDR", "MASTER_PORT"):
        env.pop(k, None)
    p1 = subprocess.run(
        [sys.executable, "-m", "textualdegremoval_tpu.cli.train_restoration",
         "--opt", cfg, "--max_iters", "1"],
        env=env, cwd=str(tmp_path / "run1"), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=560)
    assert p1.returncode == 0, p1.stdout[-3000:]
    losses1 = [float(m) for m in _LPIX.findall(p1.stdout)]
    assert losses1, f"no l_pix logged:\n{p1.stdout[-3000:]}"

    # identical images + deterministic crop -> identical global batch ->
    # the global-mean L1 must agree to reduction-order noise
    np.testing.assert_allclose(losses4[0], losses1[0], rtol=1e-5)


def test_enlarged_sampler_4way_disjoint():
    from textualdegremoval_tpu.data.sampler import EnlargedSampler

    shards = [list(EnlargedSampler(16, num_replicas=4, rank=r, ratio=1))
              for r in range(4)]
    for s in shards:
        assert len(s) == 4
    flat = [i for s in shards for i in s]
    assert sorted(flat) == list(range(16))  # disjoint + complete
