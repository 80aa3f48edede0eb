"""Tower checkpoint conversion parity: mapper, DINOv2, CLIP text (numeric)
and global-k/v extraction."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from textualdegremoval_tpu.convert.tower_maps import (
    convert_mapper, extract_global_kv, convert_dino, convert_clip_text,
)
from textualdegremoval_tpu.models.mappers import I2TMapper, CleanMapper
from textualdegremoval_tpu.models.dino import DinoVisionTransformer
from textualdegremoval_tpu.models.clip import CLIPTextEncoder
from textualdegremoval_tpu.convert.torch_to_jax import verify_against_init

from torch_oracles import OMapper, ODino, OCLIPText

KEY = jax.random.PRNGKey(0)


def randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


class TestMapperConversion:
    def test_i2t_numeric_parity(self):
        nw, din, dout, hidden = 3, 32, 24, 1280
        tm = randomize(OMapper(din, dout, nw, hidden))
        tm.eval()
        embs = torch.randn(2, 5, din, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            want = tm(embs).numpy()

        fm = I2TMapper(num_words=nw, input_dim=din, output_dim=dout)
        params = {"params": convert_mapper(tm.state_dict(), nw)}
        init = fm.init(KEY, jnp.asarray(embs.numpy()))
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, jnp.asarray(embs.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_global_kv_extraction(self):
        sd = {
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2"
            "_to_k.weight": torch.randn(8, 4),
            "down_blocks.0.attentions.0.transformer_blocks.0.attn2"
            "_to_v.weight": torch.randn(8, 4),
            "mapping_0.0.weight": torch.randn(4, 4),  # unrelated
        }
        gk = extract_global_kv(sd)
        key = "down_blocks.0.attentions.0.transformer_blocks.0.attn2"
        assert key in gk
        assert gk[key]["to_k"].shape == (4, 8)  # transposed to (in, out)


class TestDinoConversion:
    def test_numeric_parity(self):
        tm = randomize(ODino(img_size=28, patch=14, dim=32, depth=2, heads=2))
        tm.eval()
        x = torch.randn(1, 3, 28, 28, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                   depth=2, num_heads=2)
        params = {"params": convert_dino(tm.state_dict())}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, xj)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, xj)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestDinoSwiGLUConversion:
    def test_numeric_parity_swiglu(self):
        # giant2's block shape (swiglufused FFN) at toy dims
        tm = randomize(ODino(img_size=28, patch=14, dim=24, depth=2, heads=2,
                             ffn="swiglufused"))
        tm.eval()
        x = torch.randn(1, 3, 28, 28, generator=torch.Generator().manual_seed(4))
        with torch.no_grad():
            want = tm(x).numpy()

        fm = DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=24,
                                   depth=2, num_heads=2,
                                   ffn_layer="swiglufused")
        params = {"params": convert_dino(tm.state_dict())}
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        init = fm.init(KEY, xj)
        assert verify_against_init(params["params"], init["params"]) == []
        got = fm.apply(params, xj)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_giant2_factory_config(self):
        from textualdegremoval_tpu.models.dino import vit_giant2

        m = vit_giant2()
        # reference vision_transformers.py:379-393
        assert (m.embed_dim, m.depth, m.num_heads) == (1536, 40, 24)
        assert m.ffn_layer == "swiglufused"


class TestCLIPTextConversion:
    def test_numeric_parity(self):
        tm = randomize(OCLIPText(vocab=100, maxpos=16, dim=64, depth=2,
                                 heads=4))
        tm.eval()
        ids = torch.randint(0, 100, (2, 16),
                            generator=torch.Generator().manual_seed(3))
        with torch.no_grad():
            want = tm(ids).numpy()

        fm = CLIPTextEncoder(vocab_size=100, max_positions=16, width=64,
                             layers=2, heads=4, act="gelu")
        params = {"params": convert_clip_text(tm.state_dict())}
        init = fm.init(KEY, jnp.asarray(ids.numpy()))
        assert verify_against_init(params["params"], init["params"]) == []
        got, _ = fm.apply(params, jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
