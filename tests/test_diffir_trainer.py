"""DiffIR variant: frozen CLIP+mapper embed -> NAFNetDynamicFusion training."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from textualdegremoval_tpu.models.clip import CLIPVisionEncoder
from textualdegremoval_tpu.models.mappers import I2TMapper
from textualdegremoval_tpu.models.nafnet_dynamic import NAFNetDynamicFusion
from textualdegremoval_tpu.train.diffir_trainer import (
    make_embed_fn, make_diffir_train_step,
)
from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state,
)
from textualdegremoval_tpu.losses import l1_loss

pytestmark = pytest.mark.slow  # end-to-end/full-net: minutes on CPU

KEY = jax.random.PRNGKey(0)


def test_diffir_training_loop():
    enc = CLIPVisionEncoder(image_size=28, patch_size=14, width=32,
                            layers=1, heads=2)
    mapper = I2TMapper(num_words=10, input_dim=32, output_dim=1024)
    net = NAFNetDynamicFusion(width=8, middle_blk_num=1,
                              enc_blk_nums=(1,), dec_blk_nums=(1,))

    clip_view = jax.random.normal(KEY, (2, 28, 28, 3))
    lq = jax.random.normal(KEY, (2, 16, 16, 3))
    gt = lq * 0.9

    enc_p = enc.init(KEY, clip_view)["params"]
    map_p = mapper.init(KEY, jnp.zeros((2, 5, 32)))["params"]
    embed_fn = make_embed_fn(enc.apply, mapper.apply, enc_p, map_p)
    embed = embed_fn(clip_view)
    assert embed.shape == (2, 10, 1024)

    net_p = net.init(KEY, lq, embed)["params"]
    tx = build_optimizer(net_p, lambda s: 1e-3, grad_clip=0.01)
    state = create_train_state(net_p, tx)
    step = make_diffir_train_step(net.apply, l1_loss, tx)

    losses = []
    for _ in range(3):
        state, metrics = step(state, {"lq": lq, "gt": gt, "embed": embed})
        losses.append(float(metrics["l_pix"]))
    assert losses[-1] < losses[0]
