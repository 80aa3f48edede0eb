"""Profiling helpers (reference had only wall-clock iter timing; SURVEY §5).

- trace(): context manager around jax.profiler for device traces
  (view with TensorBoard or xprof).
- measure_inference_speed(): the reference's fps harness
  (nafnet_arch_utils.py:313-349) re-expressed with a forced scalar fetch per
  iteration (device-sync equivalent; also correct through remote-TPU
  relays where block_until_ready under-reports).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_inference_speed(fn, args, max_iter: int = 200,
                            warmup_iter: int = 5) -> float:
    """Returns images/sec (batch inferred from args[0].shape[0])."""
    fn = jax.jit(fn)
    for _ in range(warmup_iter):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(max_iter):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = time.perf_counter() - t0
    batch = args[0].shape[0]
    return batch * max_iter / dt
