"""Gating primitives shared by the backbones (NHWC).

* simple_gate — NAFNet's SimpleGate (network_nafnet_guided_arch.py:170-175):
  split channels in half, multiply.
"""

import jax.numpy as jnp


def simple_gate(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2
