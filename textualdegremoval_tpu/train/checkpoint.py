"""Checkpoint save/auto-resume via Orbax.

Reference semantics (base_model.py:213-351, train CLI :137-186):
* two artifact kinds — network weights (`net_g_<iter>`, holding params +
  params_ema) and full training state (`<iter>.state`: step, params,
  opt_state, ema);
* rank-0-only writes (orbax handles multi-host coordination natively);
* auto-resume: scan the state dir for the highest-numbered checkpoint.
"""

from __future__ import annotations

import os
import os.path as osp
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from textualdegremoval_tpu.train.trainer import TrainState


def _abs(path: str) -> str:
    return osp.abspath(path)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save_state(self, state: TrainState, step: int):
        path = osp.join(self.directory, f"state_{step}")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def latest_step(self) -> int | None:
        if not osp.isdir(self.directory):
            return None
        steps = [
            int(m.group(1))
            for d in os.listdir(self.directory)
            if (m := re.fullmatch(r"state_(\d+)", d))
        ]
        return max(steps) if steps else None

    def restore_state(self, template: TrainState, step: int | None = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = osp.join(self.directory, f"state_{step}")
        return self._ckptr.restore(path, template)

    def save_network(self, params, ema_params, step: int):
        """net_g_<iter> artifact: {'params': ..., 'params_ema': ...}."""
        path = osp.join(self.directory, f"net_g_{step}")
        self._ckptr.save(
            path, {"params": params, "params_ema": ema_params}, force=True
        )
        self._ckptr.wait_until_finished()

    def load_network(self, template_params, step: int, ema: bool = False):
        path = osp.join(self.directory, f"net_g_{step}")
        tree = self._ckptr.restore(
            path, {"params": template_params, "params_ema": template_params}
        )
        return tree["params_ema" if ema else "params"]
