"""FSDP-style parameter sharding (ZeRO-3 analogue) over the dp axis.

The reference has no ZeRO/FSDP (SURVEY.md §2.3); for TPU-scale training of
the larger towers (e.g. the 891M-param SD UNet in pipeline A) this shards
every parameter leaf along its largest dimension divisible by the dp axis
size, and relies on GSPMD to insert the all-gathers (forward/backward) and
reduce-scatters (grad) — the standard jit-native FSDP recipe.

Optimizer state inherits the same sharding automatically because optax
states mirror the param tree.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape: tuple[int, ...], axis_size: int,
              axis_name: str = "dp") -> P:
    """Shard the largest dimension divisible by axis_size; replicate if no
    dimension qualifies (tiny leaves: norms, gates, temperatures)."""
    if not shape:
        return P()
    candidates = [(d, i) for i, d in enumerate(shape) if d % axis_size == 0]
    if not candidates:
        return P()
    _, idx = max(candidates)
    spec = [None] * len(shape)
    spec[idx] = axis_name
    return P(*spec)


def shard_params_fsdp(mesh: Mesh, params, axis_name: str = "dp"):
    """Place a param tree with per-leaf FSDP shardings."""
    axis_size = mesh.shape[axis_name]

    def place(x):
        sh = NamedSharding(mesh, fsdp_spec(x.shape, axis_size, axis_name))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, params)


def fsdp_shardings(mesh: Mesh, params, axis_name: str = "dp"):
    """The matching sharding tree (for jit out_shardings / constraints)."""
    axis_size = mesh.shape[axis_name]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, fsdp_spec(x.shape, axis_size,
                                                axis_name)),
        params,
    )
