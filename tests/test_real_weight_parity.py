"""Real-pretrained-weight PSNR/SSIM parity harness (BASELINE configs 1/2).

The reference's acceptance protocol is its eval scripts
(scripts/eval/main_evaluation_color_denoise15.py:71-111 and
main_evaluation_deblur_derain_dehaze.py --task nafnet_deblur); the
north-star gate (BASELINE.json) is PSNR/SSIM within 0.05 dB.  No pretrained
assets exist on this rig, so the real-weight tests SKIP until they appear —
but the full command path (torch net_g.pth -> converted params -> task
constructor -> eval loop -> PSNR/SSIM) is proven here on random-weight
stand-ins synthesized from the ACTUAL reference torch module.

Asset layout (set $TDR_ASSETS_DIR, default /root/assets):

    restormer_color_denoise15/
        net_g.pth            # reference-format {'params': sd} checkpoint
        hq/*.png             # CBSD68 ground truth
        ref/*.png            # generated clean references (pipeline A)
        expected.json        # optional {"psnr": float, "ssim": float}
                             #   measured by running the reference eval
    nafnet_gopro/
        net_g.pth
        lq/*.png  hq/*.png  ref/*.png
        expected.json

With expected.json present the test asserts |psnr - expected| <= 0.05 dB
(closing the gate the day assets appear); without it, the measured number
is printed and recorded as the first baseline.
"""

import json
import os

import numpy as np
import pytest

ASSETS = os.environ.get("TDR_ASSETS_DIR", "/root/assets")


def _asset_dir(name):
    d = os.path.join(ASSETS, name)
    return d if os.path.exists(os.path.join(d, "net_g.pth")) else None


def _run_eval(task, droot, sigma=None, lq=False):
    from textualdegremoval_tpu.cli.evaluate import main

    argv = ["--task", task, "--hqroot", os.path.join(droot, "hq"),
            "--refroot", os.path.join(droot, "ref"),
            "--checkpoint_path", os.path.join(droot, "net_g.pth")]
    if sigma is not None:
        argv += ["--sigma", str(sigma)]
    if lq:
        argv += ["--lqroot", os.path.join(droot, "lq")]
    return main(argv)


def _check_expected(droot, psnr, ssim):
    exp_path = os.path.join(droot, "expected.json")
    if not os.path.exists(exp_path):
        print(f"no expected.json in {droot}; measured "
              f"psnr={psnr:.4f} ssim={ssim:.4f} (recorded, not gated)")
        return
    exp = json.load(open(exp_path))
    assert abs(psnr - float(exp["psnr"])) <= 0.05, (
        f"PSNR {psnr:.4f} vs reference {exp['psnr']:.4f}: gate 0.05 dB")
    if "ssim" in exp:
        assert abs(ssim - float(exp["ssim"])) <= 0.002


@pytest.mark.slow
@pytest.mark.skipif(_asset_dir("restormer_color_denoise15") is None,
                    reason=f"no pretrained assets at {ASSETS}/"
                           "restormer_color_denoise15 (net_g.pth)")
def test_config1_restormer_color_denoise15_cbsd68():
    droot = _asset_dir("restormer_color_denoise15")
    psnr, ssim = _run_eval("restormer_color_denoise", droot, sigma=15)
    _check_expected(droot, psnr, ssim)


@pytest.mark.slow
@pytest.mark.skipif(_asset_dir("nafnet_gopro") is None,
                    reason=f"no pretrained assets at {ASSETS}/nafnet_gopro "
                           "(net_g.pth)")
def test_config2_nafnet_gopro_deblur():
    droot = _asset_dir("nafnet_gopro")
    psnr, ssim = _run_eval("nafnet_deblur", droot, lq=True)
    _check_expected(droot, psnr, ssim)


@pytest.mark.slow  # two tiny-model CLI compiles, ~5 min on CPU
class TestStandInCommandPath:
    """The exact command the real-weight tests run, proven end to end on a
    random-weight checkpoint written by the ACTUAL reference arch code —
    so the only thing the skipped tests add is the asset files."""

    def test_checkpoint_command_loads_and_takes_effect(self, tmp_path):
        import torch
        from test_reference_parity import load_ref_arch, randomize

        mod = load_ref_arch("network_restormer_guided_arch")
        tm = randomize(mod.RestormerRefFusion(
            dim=8, num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
            heads=[1, 1, 2, 2], nf=8, ext_n_blocks=[1, 1, 1, 1],
            reffusion_n_blocks=[1, 1, 1, 1], lr_block_size=4), seed=3)
        droot = tmp_path
        (droot / "hq").mkdir()
        (droot / "ref").mkdir()
        import cv2
        rng = np.random.default_rng(0)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(droot / "hq" / "a.png"), img)
        cv2.imwrite(str(droot / "ref" / "a.png"), img)
        torch.save({"params": tm.state_dict()}, droot / "net_g.pth")

        psnr_ckpt, ssim_ckpt = _run_eval("tiny_smoke", str(droot), sigma=15)
        assert np.isfinite(psnr_ckpt) and np.isfinite(ssim_ckpt)

        # same command without the checkpoint falls back to random init —
        # a different forward, so a different PSNR: proves the weights
        # actually loaded (not silently ignored)
        from textualdegremoval_tpu.cli.evaluate import main

        psnr_init, _ = main(
            ["--task", "tiny_smoke", "--sigma", "15",
             "--hqroot", str(droot / "hq"), "--refroot", str(droot / "ref")])
        assert abs(psnr_ckpt - psnr_init) > 1e-6
