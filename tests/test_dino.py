"""DINOv2 tower + ref-crop matcher tests."""

import jax
import jax.numpy as jnp
import numpy as np

from textualdegremoval_tpu.models.dino import (
    DinoVisionTransformer, vit_base, extract_ref_windows, select_ref_crop,
)

KEY = jax.random.PRNGKey(0)


def tiny_dino():
    return DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                 depth=2, num_heads=2)


class TestDino:
    def test_patch_tokens_shape(self):
        m = tiny_dino()
        x = jax.random.normal(KEY, (2, 28, 28, 3))
        params = m.init(KEY, x)
        y = m.apply(params, x)
        assert y.shape == (2, 4, 32)

    def test_pos_embed_interpolation(self):
        m = tiny_dino()
        x28 = jax.random.normal(KEY, (1, 28, 28, 3))
        params = m.init(KEY, x28)
        # different input size reuses the same params via bicubic pos interp
        x56 = jax.random.normal(KEY, (1, 56, 56, 3))
        y = m.apply(params, x56)
        assert y.shape == (1, 16, 32)


class TestRefCrop:
    def test_extract_windows(self):
        ref = jnp.arange(1 * 8 * 8 * 1, dtype=jnp.float32).reshape(1, 8, 8, 1)
        w = extract_ref_windows(ref, patch=4, stride=2)
        assert w.shape == (1, 9, 4, 4, 1)
        np.testing.assert_array_equal(np.asarray(w[0, 0]), np.asarray(ref[0, :4, :4]))
        np.testing.assert_array_equal(np.asarray(w[0, 8]), np.asarray(ref[0, 4:, 4:]))

    def test_select_picks_identical_window(self):
        m = tiny_dino()
        lq = jax.random.normal(KEY, (1, 28, 28, 3))
        params = m.init(KEY, lq)
        # build a ref whose window at position (1,1) == lq exactly
        ref = jax.random.normal(jax.random.PRNGKey(9), (1, 42, 42, 3))
        stride = 28 // 4
        ref = ref.at[:, stride:stride + 28, stride:stride + 28].set(lq)
        sel = select_ref_crop(m.apply, params, lq, ref)
        # the identical window maximizes cosine similarity
        np.testing.assert_allclose(np.asarray(sel), np.asarray(lq), atol=1e-5)
