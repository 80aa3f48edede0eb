"""Golden tests for the basic ops vs hand-written torch oracles.

The oracles implement the documented math from scratch (SURVEY.md §2) — no
reference code is imported.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from textualdegremoval_tpu.ops import (
    bias_free_layer_norm,
    with_bias_layer_norm,
    pixel_shuffle,
    pixel_unshuffle,
    simple_gate,
    mdta_attention,
    tksa_attention,
    local_avg_pool,
)

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2)).float()


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


class TestLayerNorms:
    def test_bias_free(self):
        x = RNG.standard_normal((2, 4, 5, 8)).astype(np.float32)
        w = RNG.standard_normal(8).astype(np.float32)
        got = bias_free_layer_norm(jnp.asarray(x), jnp.asarray(w))
        xt = torch.from_numpy(x)
        var = xt.var(-1, keepdim=True, unbiased=False)
        want = xt / torch.sqrt(var + 1e-5) * torch.from_numpy(w)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)

    def test_with_bias(self):
        x = RNG.standard_normal((2, 4, 5, 8)).astype(np.float32)
        w = RNG.standard_normal(8).astype(np.float32)
        b = RNG.standard_normal(8).astype(np.float32)
        got = with_bias_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        xt = torch.from_numpy(x)
        mu = xt.mean(-1, keepdim=True)
        var = xt.var(-1, keepdim=True, unbiased=False)
        want = (xt - mu) / torch.sqrt(var + 1e-5) * torch.from_numpy(w) + torch.from_numpy(b)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("r", [2, 4])
    def test_pixel_unshuffle_matches_torch(self, r):
        x = RNG.standard_normal((2, 8, 8, 3)).astype(np.float32)
        got = pixel_unshuffle(jnp.asarray(x), r)
        want = F.pixel_unshuffle(nchw(x), r)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)

    @pytest.mark.parametrize("r", [2, 4])
    def test_pixel_shuffle_matches_torch(self, r):
        x = RNG.standard_normal((2, 4, 4, 3 * r * r)).astype(np.float32)
        got = pixel_shuffle(jnp.asarray(x), r)
        want = F.pixel_shuffle(nchw(x), r)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)

    def test_shuffle_roundtrip(self):
        x = RNG.standard_normal((1, 8, 8, 4)).astype(np.float32)
        y = pixel_shuffle(pixel_unshuffle(jnp.asarray(x), 2), 2)
        np.testing.assert_allclose(np.asarray(y), x, atol=0)


class TestGates:
    def test_simple_gate(self):
        x = RNG.standard_normal((2, 4, 4, 6)).astype(np.float32)
        got = simple_gate(jnp.asarray(x))
        want = x[..., :3] * x[..., 3:]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def _torch_mdta(q, k, v, temp):
    # oracle: L2-normalize over L, gram, per-head temperature, softmax
    q = F.normalize(q, dim=-1)
    k = F.normalize(k, dim=-1)
    attn = (q @ k.transpose(-2, -1)) * temp
    attn = attn.softmax(dim=-1)
    return attn @ v


class TestDWConvShift:
    """ops.dwconv shift formulation vs the conv emitter (torch oracle) and
    param-compatibility with nn.Conv (same kernel works in both)."""

    @pytest.mark.parametrize("ks", [3, 5])
    def test_matches_torch_depthwise(self, ks):
        from textualdegremoval_tpu.ops.dwconv import dwconv_shift

        rng = np.random.default_rng(0)
        c = 12
        x = rng.standard_normal((2, 9, 11, c)).astype(np.float32)
        k = rng.standard_normal((ks, ks, 1, c)).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
        got = np.asarray(dwconv_shift(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(b)))
        tw = torch.from_numpy(k[:, :, 0, :].transpose(2, 0, 1)[:, None])
        want = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), tw,
                        torch.from_numpy(b), padding=ks // 2, groups=c)
        np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5)

    def test_same_params_as_nn_conv(self):
        import jax
        import flax.linen as fnn
        from textualdegremoval_tpu.models.layers import DWConv

        c = 8
        x = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, 6, 6, c)), jnp.float32)
        ref_mod = fnn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                           use_bias=True)
        ours = DWConv(c, 3, use_bias=True)
        p = ref_mod.init(jax.random.PRNGKey(0), x)
        # identical param structure -> checkpoints interchangeable
        q = ours.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == \
            jax.tree_util.tree_structure(q)
        assert p["params"]["kernel"].shape == q["params"]["kernel"].shape
        np.testing.assert_allclose(np.asarray(ours.apply(p, x)),
                                   np.asarray(ref_mod.apply(p, x)),
                                   atol=1e-5)


class TestMDTA:
    def test_matches_oracle(self):
        b, h, c, l = 2, 3, 8, 16
        q = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        k = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        v = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        temp = RNG.standard_normal((h, 1, 1)).astype(np.float32)
        got = mdta_attention(*(jnp.asarray(a) for a in (q, k, v)), jnp.asarray(temp))
        want = _torch_mdta(*(torch.from_numpy(a) for a in (q, k, v)), torch.from_numpy(temp))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


class TestTKSA:
    def test_matches_oracle(self):
        b, h, c, l = 1, 2, 12, 20
        q = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        k = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        v = RNG.standard_normal((b, h, c, l)).astype(np.float32)
        temp = np.ones((h, 1, 1), np.float32)
        blend = np.asarray([0.2, 0.3, 0.1, 0.4], np.float32)

        got = tksa_attention(
            *(jnp.asarray(a) for a in (q, k, v)), jnp.asarray(temp), jnp.asarray(blend)
        )

        # oracle: 4 top-k masked softmaxes
        qt = F.normalize(torch.from_numpy(q), dim=-1)
        kt = F.normalize(torch.from_numpy(k), dim=-1)
        vt = torch.from_numpy(v)
        attn = (qt @ kt.transpose(-2, -1)) * torch.from_numpy(temp)
        want = torch.zeros_like(vt)
        for w_i, kk in zip(blend, [c // 2, c * 2 // 3, c * 3 // 4, c * 4 // 5]):
            idx = torch.topk(attn, k=kk, dim=-1)[1]
            mask = torch.zeros_like(attn).scatter_(-1, idx, 1.0)
            a = torch.where(mask > 0, attn, torch.full_like(attn, float("-inf")))
            want = want + float(w_i) * (a.softmax(dim=-1) @ vt)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


class TestTLC:
    def test_matches_cumsum_oracle(self):
        x = RNG.standard_normal((2, 12, 10, 4)).astype(np.float32)
        k1, k2 = 5, 7
        got = local_avg_pool(jnp.asarray(x), (k1, k2))

        xt = nchw(x)
        s = xt.cumsum(dim=-1).cumsum(dim=-2)
        s = F.pad(s, (1, 0, 1, 0))
        s1, s2, s3, s4 = (
            s[:, :, :-k1, :-k2],
            s[:, :, :-k1, k2:],
            s[:, :, k1:, :-k2],
            s[:, :, k1:, k2:],
        )
        out = (s4 + s1 - s2 - s3) / (k1 * k2)
        h, w = xt.shape[2:]
        _h, _w = out.shape[2:]
        pad2d = ((w - _w) // 2, (w - _w + 1) // 2, (h - _h) // 2, (h - _h + 1) // 2)
        want = F.pad(out, pad2d, mode="replicate")
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-4)

    def test_global_fallback(self):
        x = RNG.standard_normal((1, 4, 4, 2)).astype(np.float32)
        got = local_avg_pool(jnp.asarray(x), (8, 8))
        want = x.mean(axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestDWConvGradShift:
    """dwconv_grad_shift: conv-emitter forward, shift-form custom_vjp —
    forward bitwise-equal to lax.conv, gradients equal to autodiff of the
    conv (both accumulate f32)."""

    @pytest.mark.parametrize("ks", [3, 5])
    def test_forward_and_grads_match_autodiff(self, ks):
        import jax
        from textualdegremoval_tpu.ops.dwconv import (
            dwconv_grad_shift, _conv_dw)

        rng = np.random.default_rng(2)
        c = 10
        x = jnp.asarray(rng.standard_normal((2, 9, 11, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((ks, ks, 1, c)), jnp.float32)

        np.testing.assert_array_equal(
            np.asarray(dwconv_grad_shift(x, k)), np.asarray(_conv_dw(x, k)))

        def loss_ours(x, k):
            return jnp.sum(jnp.sin(dwconv_grad_shift(x, k)))

        def loss_conv(x, k):
            return jnp.sum(jnp.sin(_conv_dw(x, k)))

        gx0, gk0 = jax.grad(loss_conv, argnums=(0, 1))(x, k)
        gx1, gk1 = jax.grad(loss_ours, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0),
                                   rtol=1e-5, atol=1e-5)
