"""Profiling helpers (reference had only wall-clock iter timing; SURVEY §5).

- trace(): context manager around jax.profiler for device traces
  (view with TensorBoard or xprof).
- measure_inference_speed(): the reference's fps harness
  (nafnet_arch_utils.py:313-349) re-expressed with a forced scalar fetch per
  iteration (device-sync equivalent; also correct through remote-TPU
  relays where block_until_ready under-reports).
- count_params() / model_complexity(): the reference's ptflops accounting
  (network_nafnet_guided_diffir_arch.py:656-679) from XLA's compiled cost
  analysis — exact for the program XLA actually runs, where ptflops
  approximates module-by-module.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    """Total parameter count of a pytree."""
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(params))


def model_complexity(apply_fn, params, *args) -> dict:
    """{'params', 'flops', 'macs'} for apply_fn(params, *args).

    flops come from XLA's compiled cost analysis at the given input
    shapes (macs = flops / 2, the ptflops convention the reference
    prints).  Compiles for the current default backend."""
    compiled = jax.jit(apply_fn).lower(params, *args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float((cost or {}).get("flops", float("nan")))
    return {"params": count_params(params), "flops": flops,
            "macs": flops / 2.0}


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
