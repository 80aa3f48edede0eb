"""Eval CLI smoke: synthetic noise protocol, per-task table, PSNR/SSIM loop."""

import numpy as np
import cv2
import pytest


@pytest.fixture(scope="module")
def eval_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("evald")
    rng = np.random.default_rng(0)
    for sub in ("hq", "ref"):
        (root / sub).mkdir()
    for i in range(2):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "hq" / f"{i}.png"), img)
        cv2.imwrite(str(root / "ref" / f"{i}.png"), img)
    return root


@pytest.mark.slow
def test_evaluate_denoise_smoke(eval_dirs, capsys):
    from textualdegremoval_tpu.cli.evaluate import main

    psnr, ssim = main([
        "--task", "tiny_smoke", "--sigma", "15",
        "--hqroot", str(eval_dirs / "hq"),
        "--refroot", str(eval_dirs / "ref"),
        "--max_images", "2",
    ])
    assert np.isfinite(psnr) and np.isfinite(ssim)
    out = capsys.readouterr().out
    assert "mean PSNR" in out
