"""NIQE mechanics + FID math tests."""

import numpy as np
import pytest

from textualdegremoval_tpu.metrics.fid import (
    compute_statistics, frechet_distance, calculate_fid,
)


class TestFID:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        f = rng.standard_normal((500, 16))
        assert abs(calculate_fid(f, f)) < 1e-6

    def test_mean_shift(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((2000, 8))
        b = a + 2.0
        fid = calculate_fid(a, b)
        # ||mu diff||^2 = 8 * 4 = 32 dominates
        assert 30 < fid < 34

    def test_known_gaussians(self):
        mu1, s1 = np.zeros(2), np.eye(2)
        mu2, s2 = np.ones(2), np.eye(2) * 4
        # ||mu||^2=2; Tr(I + 4I - 2*2I) = Tr(I) = 2*(1+4-4)=2
        d = frechet_distance(mu1, s1, mu2, s2)
        assert abs(d - (2 + 2)) < 1e-6


class TestNIQE:
    def test_runs_with_synthetic_params(self, tmp_path):
        from textualdegremoval_tpu.metrics.niqe import (
            calculate_niqe, _gaussian_window,
        )
        rng = np.random.default_rng(0)
        params = tmp_path / "pris.npz"
        np.savez(params,
                 mu_pris_param=rng.standard_normal((1, 36)),
                 cov_pris_param=np.eye(36),
                 gaussian_window=_gaussian_window())
        img = (rng.random((192, 192, 3)) * 255).astype(np.float64)
        score = calculate_niqe(img, params_path=str(params))
        assert np.isfinite(score) and score >= 0

    def test_missing_params_raise(self):
        from textualdegremoval_tpu.metrics.niqe import calculate_niqe

        with pytest.raises(FileNotFoundError):
            calculate_niqe(np.zeros((96, 96, 3)), params_path="/nonexistent")
