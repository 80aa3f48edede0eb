"""InceptionV3 pool3 extractor: conversion parity + working FID pipeline.

Closes the reference's dead-FID gap (SURVEY §2.5 item 9): the torch oracle
(tests/torch_inception_oracle.py, torchvision naming) is converted through
convert/torch_to_jax.py and must match the Flax net, and NIQE must run with
no extra arguments off the packaged pristine-params table.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from textualdegremoval_tpu.convert import convert_state_dict
from textualdegremoval_tpu.convert.torch_to_jax import (
    split_batch_stats, verify_against_init)
from textualdegremoval_tpu.metrics.inception import InceptionV3
from textualdegremoval_tpu.metrics.fid import calculate_fid_from_images

from torch_inception_oracle import OInceptionV3

KEY = jax.random.PRNGKey(0)


def _healthy_randomize(model, seed=0):
    """Random weights with O(1) activations through depth (kaiming convs,
    BN scales near 1) so deep-layer parity is numerically meaningful."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * (2.0 / fan_in) ** 0.5)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(1 + 0.1 * torch.randn(m.weight.shape,
                                                     generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.05 * torch.randn(
                    m.running_mean.shape, generator=g))
                m.running_var.copy_(1 + 0.1 * torch.rand(
                    m.running_var.shape, generator=g))
    return model


@pytest.mark.slow
def test_pool3_parity_vs_torch_oracle():
    tm = _healthy_randomize(OInceptionV3())
    tm.eval()
    x = torch.rand(2, 3, 128, 128, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tm(x).numpy()

    fm = InceptionV3()
    tree = split_batch_stats(convert_state_dict(tm.state_dict()))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = fm.init(KEY, xj)
    assert verify_against_init(tree["params"], variables["params"]) == []
    got = np.asarray(fm.apply(tree, xj))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_fid_pipeline_runs_end_to_end():
    rng = np.random.default_rng(0)
    a = rng.random((4, 64, 64, 3), np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    fid_aa = calculate_fid_from_images(a, a, batch_size=4)
    fid_ab = calculate_fid_from_images(a, b, batch_size=4)
    assert abs(fid_aa) < 1e-3
    assert np.isfinite(fid_ab) and fid_ab > fid_aa


def test_niqe_runs_with_no_arguments():
    from textualdegremoval_tpu.metrics.niqe import calculate_niqe

    rng = np.random.default_rng(0)
    img = (rng.random((128, 128, 3)) * 255).astype(np.float64)
    score = calculate_niqe(img)
    assert np.isfinite(score)
