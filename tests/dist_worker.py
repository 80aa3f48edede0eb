"""Worker for the 2-process CPU distributed smoke test.

Launched twice by tests/test_bootstrap.py with torch-launcher-style env vars
(RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT — the reference's
`init_dist_pytorch` surface).  Initializes the JAX distributed runtime via
parallel/bootstrap.py, builds a global 2-device dp mesh (1 CPU device per
process), and runs one data-parallel train step of the tiny flagship model —
gradients all-reduced across the two processes by GSPMD.

Prints "LOSS <value>" on success; the parent asserts both processes print
the same finite loss.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    from textualdegremoval_tpu.parallel.bootstrap import (
        init_distributed, is_main_process)

    pid, nproc = init_distributed()
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    devices = jax.devices()
    assert len(devices) == 2, f"expected 2 global devices, got {devices}"
    mesh = Mesh(np.asarray(devices), ("dp",))

    # cross-process psum sanity: sum of (pid+1) over both processes == 3
    local = np.full((1,), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    np.testing.assert_allclose(jax.device_get(total), 3.0)

    # one DP train step on the tiny flagship (per-process batch of 1)
    from textualdegremoval_tpu.models.restormer import RestormerRefFusion
    from textualdegremoval_tpu.train.trainer import (
        build_optimizer, create_train_state, make_train_step)
    from textualdegremoval_tpu.train.schedules import (
        cosine_annealing_restart_cyclic_lr)
    from textualdegremoval_tpu.losses import l1_loss

    model = RestormerRefFusion(
        dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        heads=(1, 1, 2, 2), nf=8, ext_n_blocks=(1, 1, 1, 1),
        reffusion_n_blocks=(1, 1, 1, 1), lr_block_size=4)
    key = jax.random.PRNGKey(0)
    host = jax.random.normal(key, (1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(key, host, host)["params"]

    sched = cosine_annealing_restart_cyclic_lr(
        2e-4, periods=[10, 10], restart_weights=[1, 1], eta_mins=[2e-4, 1e-6])
    tx = build_optimizer(params, sched, sched, grad_clip=0.01,
                         param_fix_iterations=1)
    state = create_train_state(params, tx)

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("dp"))
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)
    rng = np.random.default_rng(pid)  # different data per process
    batch = {
        k: jax.make_array_from_process_local_data(
            dsh, rng.standard_normal((1, 32, 32, 3), np.float32))
        for k in ("lq", "ref", "gt")
    }
    with mesh:
        step = make_train_step(model.apply, l1_loss, tx, donate=False)
        _, metrics = step(state, batch)
        loss = float(jax.device_get(
            jax.jit(lambda x: x, out_shardings=repl)(metrics["l_pix"])))
    assert np.isfinite(loss)
    print(f"LOSS {loss:.6f}", flush=True)
    assert is_main_process() == (pid == 0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
