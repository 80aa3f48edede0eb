"""Parity tests for ops.convgrad.conv_grad_shift (dense 3x3 conv with a
shift-matmul filter gradient) and its Conv3x3 wrapper in models/layers.py.

Oracle: jax autodiff through the plain lax.conv_general_dilated forward —
the custom_vjp must be an exact reformulation of the same math (f32 on CPU,
`jax_default_matmul_precision=highest` from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textualdegremoval_tpu.ops.convgrad import conv_grad_shift


def _oracle(x, kernel, stride):
    p = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("stride,cin,cout,h", [
    (1, 8, 8, 16),
    (1, 3, 8, 16),
    (2, 8, 16, 16),
    (2, 8, 16, 17),   # odd spatial size: OH = ceil? floor((17+2-3)/2)+1 = 9
])
def test_conv_grad_shift_matches_autodiff(stride, cin, cout, h):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, h, cin), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1

    y = conv_grad_shift(x, kernel, stride)
    y_ref = _oracle(x, kernel, stride)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)

    g = jax.random.normal(k3, y.shape, jnp.float32)

    def loss_new(x, kernel):
        return jnp.sum(conv_grad_shift(x, kernel, stride) * g)

    def loss_ref(x, kernel):
        return jnp.sum(_oracle(x, kernel, stride) * g)

    dx, dk = jax.grad(loss_new, argnums=(0, 1))(x, kernel)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_impls_agree():
    """Conv3x3(impl='shift') and impl='conv' share params and gradients."""
    from textualdegremoval_tpu.models.layers import Conv3x3

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 12, 12, 8), jnp.float32)
    m_shift = Conv3x3(8, impl="shift")
    m_conv = Conv3x3(8, impl="conv")
    params = m_shift.init(key, x)
    # identical param tree (names/shapes) -> checkpoints interchange
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(m_conv.init(key, x))

    def loss(m, p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    la, ga = jax.value_and_grad(loss, argnums=1)(m_shift, params, x)
    lb, gb = jax.value_and_grad(loss, argnums=1)(m_conv, params, x)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_masa_encoder_param_names_unchanged():
    """The Conv3x3 swap must not move checkpoint keys: the encoder's param
    tree keeps nn.Conv's kernel/bias leaf names."""
    from textualdegremoval_tpu.models.layers import MASAEncoder

    enc = MASAEncoder(8, (1, 1), 2)
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)))["params"]
    assert set(params["conv_L1"].keys()) == {"kernel", "bias"}
    assert params["conv_L1"]["kernel"].shape == (3, 3, 3, 8)
    assert set(params["blk_L1_0"]["conv1"].keys()) == {"kernel", "bias"}
    assert params["conv_L2"]["kernel"].shape == (3, 3, 8, 16)
