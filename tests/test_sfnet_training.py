"""SFNet training with BatchNorm batch_stats: the train step must thread and
update the mutable collection, and multi-scale supervision must apply."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import flax.traverse_util as tu

from textualdegremoval_tpu.models.sfnet import SFNetRefFusion
from textualdegremoval_tpu.train.trainer import (
    build_optimizer, create_train_state, make_train_step,
)
from textualdegremoval_tpu.losses import l1_loss

pytestmark = pytest.mark.slow  # end-to-end/full-net: minutes on CPU

KEY = jax.random.PRNGKey(0)


def test_sfnet_train_step_updates_batch_stats():
    m = SFNetRefFusion(num_res=2, base_channel=8, nf=8,
                       ext_n_blocks=(1, 1, 1), reffusion_n_blocks=(1, 1, 1),
                       lr_block_size=4, use_running_average=False)
    lq = jax.random.normal(KEY, (2, 32, 32, 3))
    ref = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    gt = lq * 0.9
    variables = m.init(KEY, lq, ref)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    assert batch_stats, "SFNet must have BatchNorm batch_stats"

    tx = build_optimizer(params, lambda s: 1e-3, grad_clip=0.01)
    state = create_train_state(params, tx,
                               model_state={"batch_stats": batch_stats})
    step = make_train_step(m.apply, l1_loss, tx, donate=False)

    bs_before = tu.flatten_dict(
        jax.tree_util.tree_map(np.asarray, state.model_state["batch_stats"]))
    losses = []
    for _ in range(3):
        state, metrics = step(state, {"lq": lq, "ref": ref, "gt": gt})
        losses.append(float(metrics["l_pix"]))
    assert losses[-1] < losses[0]
    bs_after = tu.flatten_dict(state.model_state["batch_stats"])
    moved = [k for k in bs_after
             if not np.allclose(bs_before[k], np.asarray(bs_after[k]))]
    assert moved, "batch_stats should update during training"
