"""Golden tests for the MASA search/transfer ops vs the torch oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from textualdegremoval_tpu.ops import (
    unfold_nhwc,
    fold_overlap_add,
    masa_match_and_warp,
)
from textualdegremoval_tpu.ops.masa import fold_divisor

from torch_oracles import masa_oracle

RNG = np.random.default_rng(7)


class TestUnfold:
    @pytest.mark.parametrize(
        "ks,stride,dilation,padding",
        [(3, 1, 1, 0), (3, 1, 1, 1), (3, 1, 2, 2), (3, 2, 1, 0), (6, 2, 1, 0)],
    )
    def test_matches_torch_unfold(self, ks, stride, dilation, padding):
        x = RNG.standard_normal((2, 10, 12, 4)).astype(np.float32)
        got = unfold_nhwc(jnp.asarray(x), ks, stride, dilation, padding)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        want = F.unfold(xt, ks, dilation=dilation, padding=padding, stride=stride)
        lh, lw = got.shape[1], got.shape[2]
        want = want.view(2, -1, lh, lw).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


class TestFold:
    @pytest.mark.parametrize("psize,scale", [(3, 1), (3, 2), (3, 4)])
    def test_matches_torch_fold(self, psize, scale):
        lh, lw, c = 6, 5, 3
        k = psize * scale
        patches = RNG.standard_normal((2, lh, lw, c * k * k)).astype(np.float32)
        got = fold_overlap_add(jnp.asarray(patches), psize, scale)

        pt = torch.from_numpy(patches.reshape(2, lh * lw, c * k * k).transpose(0, 2, 1))
        want = F.fold(
            pt, (lh * scale, lw * scale), kernel_size=k,
            padding=(psize // 2) * scale, stride=scale,
        )
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_divisor_matches_torch(self):
        lh = lw = 4
        psize, scale = 3, 2
        k = psize * scale
        got = fold_divisor(lh, lw, psize, scale)
        ones = torch.ones(1, k * k, lh * lw)
        want = F.fold(ones, (lh * scale, lw * scale), kernel_size=k,
                      padding=(psize // 2) * scale, stride=scale)
        np.testing.assert_allclose(
            np.asarray(got)[0, ..., 0], want.numpy()[0, 0], atol=1e-6
        )


def make_pyramid(n, c_deep, h_deep, w_deep, nscales, seed=0):
    """Random ref pyramid shallow->deep; channels halve per level up."""
    rng = np.random.default_rng(seed)
    pyr = []
    for level in range(nscales):
        s = 2 ** (nscales - 1 - level)
        cs = c_deep // s
        pyr.append(
            rng.standard_normal((n, h_deep * s, w_deep * s, cs)).astype(np.float32)
        )
    return pyr


class TestMASAFull:
    @pytest.mark.parametrize("nscales", [3, 4])
    def test_matches_oracle(self, nscales):
        n, c, hd, wd = 2, 8, 16, 16
        lq = RNG.standard_normal((n, hd, wd, c)).astype(np.float32)
        pyr = make_pyramid(n, c, hd, wd, nscales, seed=3)

        warps = masa_match_and_warp(
            jnp.asarray(lq), [jnp.asarray(p) for p in pyr], lr_block_size=8
        )

        lq_t = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        pyr_t = [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in pyr]
        want = masa_oracle(lq_t, pyr_t, lr_block_size=8)

        assert len(warps) == nscales
        for got_l, want_l in zip(warps, want):
            got_np = np.asarray(got_l)
            want_np = want_l.numpy().transpose(0, 2, 3, 1)
            assert got_np.shape == want_np.shape
            np.testing.assert_allclose(got_np, want_np, atol=2e-4)

    def test_nonsquare_and_jit(self):
        import jax

        n, c, hd, wd = 1, 8, 16, 24
        lq = RNG.standard_normal((n, hd, wd, c)).astype(np.float32)
        pyr = make_pyramid(n, c, hd, wd, 3, seed=5)

        fn = jax.jit(
            lambda a, b: masa_match_and_warp(a, b, lr_block_size=8)
        )
        warps = fn(jnp.asarray(lq), [jnp.asarray(p) for p in pyr])

        lq_t = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        pyr_t = [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in pyr]
        want = masa_oracle(lq_t, pyr_t, lr_block_size=8)
        for got_l, want_l in zip(warps, want):
            np.testing.assert_allclose(
                np.asarray(got_l), want_l.numpy().transpose(0, 2, 3, 1), atol=2e-4
            )


def _transfer_oracle(rw, att, idx, psize, s):
    """Independent take_along_axis formulation of the MASA fold (the
    pre-matmul implementation), used to validate masa_transfer's forward
    AND its autodiff backward against a structurally different program."""
    import jax
    nb, hs, ws, c = rw.shape
    d2y, d2x = hs // s, ws // s
    _, ky, kx = idx.shape
    rx = d2x - psize + 1
    half = psize // 2
    tiles = rw.reshape(nb, d2y, s, d2x, s, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(nb, d2y * d2x, s * s * c)
    iy, ix = idx // rx, idx % rx
    out = jnp.zeros((nb, ky, kx, s * s * c), jnp.float32)
    cnt = jnp.zeros((1, ky, kx, 1), jnp.float32)
    for a in range(psize):
        oy = a - half
        for b in range(psize):
            ox = b - half
            iy_sh = jnp.roll(iy, (oy, ox), axis=(1, 2))
            ix_sh = jnp.roll(ix, (oy, ox), axis=(1, 2))
            g = (iy_sh + a) * d2x + (ix_sh + b)
            sel = jnp.take_along_axis(
                tiles, g.reshape(nb, ky * kx, 1), axis=1
            ).reshape(nb, ky, kx, s * s * c)
            valid = jnp.zeros((1, ky, kx, 1), jnp.float32)
            valid = valid.at[:, max(0, oy):min(ky, ky + oy),
                             max(0, ox):min(kx, kx + ox)].set(1.0)
            out = out + sel * valid
            cnt = cnt + valid
    out = (out / cnt).reshape(nb, ky, kx, s, s, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(nb, ky * s, kx * s, c)
    att_r = jax.image.resize(att[..., None], (nb, ky * s, kx * s, 1),
                             method="bilinear")
    return out * att_r


class TestTransferGrads:
    """masa_transfer (single selection-count matmul) must match the plain
    take_along_axis fold — forward and autodiff gradients."""

    def test_grads_match_gather_autodiff(self):
        import jax
        from textualdegremoval_tpu.ops.masa import masa_transfer

        rng = np.random.default_rng(3)
        nb, d2y, d2x, s, c, psize = 3, 6, 7, 2, 4, 3
        ky, kx = 4, 5
        rw = jnp.asarray(rng.standard_normal(
            (nb, d2y * s, d2x * s, c)), jnp.float32)
        att = jnp.asarray(rng.standard_normal((nb, ky, kx)), jnp.float32)
        ry, rx = d2y - psize + 1, d2x - psize + 1
        idx = jnp.asarray(rng.integers(0, ry * rx, (nb, ky, kx)), jnp.int32)

        def loss_ours(rw, att):
            return jnp.sum(jnp.sin(masa_transfer(rw, idx, att, psize, s)))

        def loss_plain(rw, att):
            return jnp.sum(jnp.sin(_transfer_oracle(rw, att, idx, psize, s)))

        np.testing.assert_allclose(
            np.asarray(masa_transfer(rw, idx, att, psize, s)),
            np.asarray(_transfer_oracle(rw, att, idx, psize, s)),
            rtol=1e-5, atol=1e-6)
        g0 = jax.grad(loss_plain, argnums=(0, 1))(rw, att)
        g1 = jax.grad(loss_ours, argnums=(0, 1))(rw, att)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                                   rtol=1e-5, atol=1e-6)


class TestGatherWindowsGrads:
    """masa_gather_windows' custom backward (sequential block-granular
    DUS-add loop) must match the autodiff transpose of the plain vmapped
    dynamic_slice gather — including overlapping windows, scale > 1, and
    repeated corners (the overlap-accumulation path)."""

    def test_grads_match_autodiff_scatter(self):
        import jax
        from textualdegremoval_tpu.ops.masa import masa_gather_windows

        rng = np.random.default_rng(7)
        n, h, w, c = 2, 14, 17, 5
        pb, d2y, d2x, scale = 6, 4, 5, 2
        feat = jnp.asarray(
            rng.standard_normal((n, h * scale, w * scale, c)), jnp.float32)
        # overlapping + repeated corners
        y1 = jnp.asarray(rng.integers(0, h - d2y, (n, pb)), jnp.int32)
        x1 = jnp.asarray(rng.integers(0, w - d2x, (n, pb)), jnp.int32)
        y1 = y1.at[:, 1].set(y1[:, 0])
        x1 = x1.at[:, 1].set(x1[:, 0])

        def plain_gather(feat):
            def slice_one(img, yy, xx):
                return jax.lax.dynamic_slice(
                    img, (yy * scale, xx * scale, 0),
                    (d2y * scale, d2x * scale, c))
            per = jax.vmap(slice_one, in_axes=(None, 0, 0))
            return jax.vmap(per, in_axes=(0, 0, 0))(feat, y1, x1)

        got_f = masa_gather_windows(feat, y1, x1, d2y, d2x, scale)
        np.testing.assert_allclose(np.asarray(got_f),
                                   np.asarray(plain_gather(feat)))

        def loss_ours(feat):
            return jnp.sum(jnp.sin(
                masa_gather_windows(feat, y1, x1, d2y, d2x, scale)))

        def loss_plain(feat):
            return jnp.sum(jnp.sin(plain_gather(feat)))

        g_ours = jax.grad(loss_ours)(feat)
        g_plain = jax.grad(loss_plain)(feat)
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_plain),
                                   rtol=1e-5, atol=1e-6)

    def test_grads_under_jit_and_scale1(self):
        import jax
        from textualdegremoval_tpu.ops.masa import masa_gather_windows

        rng = np.random.default_rng(11)
        n, h, w, c = 1, 12, 12, 3
        pb, d2y, d2x = 4, 5, 5
        feat = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
        y1 = jnp.zeros((n, pb), jnp.int32)  # fully overlapping
        x1 = jnp.asarray([[0, 1, 0, 7]], jnp.int32)

        @jax.jit
        def loss(feat):
            return jnp.sum(
                masa_gather_windows(feat, y1, x1, d2y, d2x, 1) ** 2)

        g = jax.grad(loss)(feat)
        # oracle: accumulate each window's 2*window contribution by hand
        want = np.zeros_like(np.asarray(feat))
        f = np.asarray(feat)
        for b in range(pb):
            yy, xx = int(y1[0, b]), int(x1[0, b])
            want[0, yy:yy + d2y, xx:xx + d2x] += \
                2 * f[0, yy:yy + d2y, xx:xx + d2x]
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-6)
