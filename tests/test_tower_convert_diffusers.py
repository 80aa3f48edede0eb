"""Numeric conversion parity for diffusers-shaped VAE and UNet oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from textualdegremoval_tpu.convert.tower_maps import convert_vae, convert_unet
from textualdegremoval_tpu.convert.torch_to_jax import verify_against_init
from textualdegremoval_tpu.models.vae import AutoencoderKL
from textualdegremoval_tpu.models.unet import UNet2DCondition

from torch_oracles import OVAE, OUNet

KEY = jax.random.PRNGKey(0)


def randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


class TestVAEConversion:
    def test_encode_decode_parity(self):
        tm = randomize(OVAE(chs=(16, 32), layers=1), seed=7)
        tm.eval()
        x = torch.randn(1, 3, 16, 16, generator=torch.Generator().manual_seed(8))
        with torch.no_grad():
            want_m = tm.encode_moments(x).numpy()
            z = torch.from_numpy(want_m[:, :4])
            want_dec = tm.decode(z).numpy()

        fm = AutoencoderKL(block_out_channels=(16, 32), layers_per_block=1)
        params = {"params": convert_vae(tm.state_dict(), n_down=2,
                                        layers_per_block=1)}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, xj, KEY)
        assert verify_against_init(params["params"], init["params"]) == []

        mean, logvar = fm.apply(params, xj, method=AutoencoderKL.encode_moments)
        np.testing.assert_allclose(
            np.asarray(mean).transpose(0, 3, 1, 2), want_m[:, :4], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(logvar).transpose(0, 3, 1, 2),
            np.clip(want_m[:, 4:], -30, 20), atol=1e-4)

        dec = fm.apply(params, jnp.asarray(want_m[:, :4].transpose(0, 2, 3, 1)),
                       method=AutoencoderKL.decode)
        np.testing.assert_allclose(
            np.asarray(dec).transpose(0, 3, 1, 2), want_dec, atol=1e-4)


class TestUNetConversion:
    def test_forward_parity_with_global_kv_copy(self):
        tm = randomize(OUNet(chs=(32, 64), layers=1, ctx=64, head_dim=16),
                       seed=9)
        tm.eval()
        g = torch.Generator().manual_seed(10)
        x = torch.randn(1, 4, 16, 16, generator=g)
        t = torch.tensor([37])
        ctx = torch.randn(1, 8, 64, generator=g)
        with torch.no_grad():
            want = tm(x, t, ctx).numpy()

        fm = UNet2DCondition(block_out_channels=(32, 64), layers_per_block=1,
                             context_dim=64, head_dim=16)
        params = {"params": convert_unet(tm.state_dict(), n_blocks=2,
                                         layers_per_block=1)}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        tj = jnp.asarray(t.numpy())
        cj = jnp.asarray(ctx.numpy())
        init = fm.init(KEY, xj, tj, cj)
        assert verify_against_init(params["params"], init["params"]) == []

        got = fm.apply(params, xj, tj, cj, use_global_kv=False)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)

        # global K/V were initialized as copies of to_k/to_v -> identical
        # output through the injected path (the reference's clone-at-wiring)
        got_g = fm.apply(params, xj, tj, cj, use_global_kv=True)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(got),
                                   atol=1e-5)
