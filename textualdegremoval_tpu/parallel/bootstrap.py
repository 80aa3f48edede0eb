"""Multi-host bootstrap: the TPU-native `init_dist` equivalent.

The reference initializes NCCL process groups from either launcher env vars
or slurm (`utils/utils_dist.py:10-58`: `init_dist_pytorch` reads RANK /
WORLD_SIZE set by `torch.distributed.launch`; `init_dist_slurm` derives
MASTER_ADDR from `scontrol show hostname` and the rank from SLURM_PROCID).

On TPU the analogue is `jax.distributed.initialize()`: one process per host,
a coordinator rendezvous, and from then on `jax.devices()` is the *global*
device list so GSPMD collectives ride ICI/DCN automatically.  This module
resolves the rendezvous parameters the same three ways the reference does:

1. explicit arguments,
2. launcher env vars — JAX-style (COORDINATOR_ADDRESS, NUM_PROCESSES,
   PROCESS_ID) or torch-launcher-style (MASTER_ADDR/MASTER_PORT,
   WORLD_SIZE, RANK) so reference launch scripts port unchanged,
3. slurm env (SLURM_NTASKS / SLURM_PROCID / SLURM_STEP_NODELIST via
   `scontrol show hostname`, exactly the reference's discovery),

falling back to single-process (no-op) when nothing indicates a multi-host
launch — so every CLI can call this unconditionally.
"""

from __future__ import annotations

import os
import subprocess

import jax

_DEFAULT_PORT = 29500
_initialized = False


def _slurm_coordinator(port: int) -> str | None:
    nodelist = os.environ.get("SLURM_STEP_NODELIST") or os.environ.get(
        "SLURM_NODELIST")
    if not nodelist:
        return None
    try:
        host = subprocess.check_output(
            ["scontrol", "show", "hostname", nodelist], text=True
        ).split()[0]
    except (OSError, subprocess.CalledProcessError, IndexError):
        # scontrol unavailable: single-name nodelists are usable directly
        if any(c in nodelist for c in "[,"):
            raise RuntimeError(
                f"cannot resolve slurm nodelist {nodelist!r} without scontrol")
        host = nodelist
    return f"{host}:{port}"


def resolve_rendezvous(port: int = _DEFAULT_PORT):
    """Returns (coordinator_address, num_processes, process_id) or None when
    the environment does not describe a multi-process launch."""
    env = os.environ
    # 1. JAX-style explicit env
    if "COORDINATOR_ADDRESS" in env:
        return (env["COORDINATOR_ADDRESS"],
                int(env.get("NUM_PROCESSES", env.get("WORLD_SIZE", 1))),
                int(env.get("PROCESS_ID", env.get("RANK", 0))))
    # 2. torch-launcher style (reference init_dist 'pytorch' mode)
    if "RANK" in env and "WORLD_SIZE" in env:
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        p = env.get("MASTER_PORT", str(port))
        return (f"{addr}:{p}", int(env["WORLD_SIZE"]), int(env["RANK"]))
    # 3. slurm (reference init_dist 'slurm' mode)
    if "SLURM_PROCID" in env and int(env.get("SLURM_NTASKS", "1")) > 1:
        coord = _slurm_coordinator(int(env.get("MASTER_PORT", port)))
        if coord is not None:
            return (coord, int(env["SLURM_NTASKS"]), int(env["SLURM_PROCID"]))
    return None


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    port: int = _DEFAULT_PORT,
) -> tuple[int, int]:
    """Initialize the JAX distributed runtime if the launch is multi-process.

    Idempotent; safe to call from every CLI.  Returns
    (process_index, process_count) after (possible) initialization.
    """
    global _initialized
    if not _initialized:
        if coordinator_address is None:
            rv = resolve_rendezvous(port)
        else:
            rv = (coordinator_address, num_processes or 1, process_id or 0)
        if rv is not None and rv[1] > 1:
            addr, nproc, pid = rv
            # CPU multi-process needs a cross-host collectives backend; gloo
            # ships with jaxlib and is a no-op choice for TPU runs.
            if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
                try:
                    jax.config.update(
                        "jax_cpu_collectives_implementation", "gloo")
                except Exception:
                    pass
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=nproc,
                process_id=pid,
            )
        _initialized = True
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for I/O (the reference's @master_only)."""
    return jax.process_index() == 0
