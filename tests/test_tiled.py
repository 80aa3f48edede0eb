"""Tiled inference: identity net reproduces the input exactly through the
overlap blending; tiling covers non-divisible sizes."""

import numpy as np
import jax
import jax.numpy as jnp

from textualdegremoval_tpu.utils.tiled import infer_tiled


def test_identity_blend_exact():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 70, 90, 3)).astype(np.float32))
    out = infer_tiled(lambda x: x, img, tile=32, overlap=8)
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)


def test_small_image_passthrough():
    img = jnp.ones((1, 16, 16, 3))
    out = infer_tiled(lambda x: x * 2, img, tile=32)
    np.testing.assert_allclose(out, 2.0)


def test_with_ref_model():
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion

    m = RestormerRefFusion(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
    key = jax.random.PRNGKey(0)
    lq = jax.random.normal(key, (1, 96, 96, 3))
    ref = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = m.init(key, lq[:, :64, :64], ref)
    fwd = jax.jit(lambda a, b: m.apply(params, a, b))
    out = infer_tiled(fwd, lq, ref, tile=64, overlap=16)
    assert out.shape == (1, 96, 96, 3)
    assert np.isfinite(out).all()
