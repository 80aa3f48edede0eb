"""Device mesh + sharding helpers.

The reference's distributed surface is data-parallel only (NCCL DDP,
SURVEY.md §2.3).  Here DP is a 1-D `jax.sharding.Mesh` over all devices with
batches sharded on axis 0 and parameters replicated; XLA inserts the gradient
all-reduce during jit compilation of the train step (the `reduce_loss_dict`
equivalent is free: the loss is a global mean).

The mesh is ('dp', 'sp') capable: 'sp' (spatial) is reserved for sharding the
H axis of very large images — the TPU-idiomatic extension of the reference's
TLC/pad_test machinery (SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """1-D (or dp x sp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // sp
    dev = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(dev, ("dp", "sp"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded on axis 0."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
