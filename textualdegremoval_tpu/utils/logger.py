"""Logging: rank-0-aware root logger + train-loop message logger.

Parity: reference utils/logger.py (get_root_logger with rank-0 file handler,
MessageLogger epoch/iter/lr/eta/loss line, TensorBoard scalars).  TensorBoard
goes through tf.summary when tensorflow is importable; otherwise scalars are
appended to a JSONL file (zero-dependency observability)."""

from __future__ import annotations

import datetime
import json
import logging
import os
import time

import jax

_initialized = set()


def get_root_logger(name="tdr", log_level=logging.INFO, log_file=None):
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.setLevel(log_level if jax.process_index() == 0 else logging.ERROR)
    if log_file and jax.process_index() == 0:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _initialized.add(name)
    return logger


class ScalarWriter:
    """TB-if-available scalar sink with JSONL fallback, optional wandb
    mirroring (reference init_wandb_logger tensorboard-sync mode)."""

    def __init__(self, log_dir: str, wandb_opt: dict | None = None):
        self._tb = None
        self._jsonl = None
        self._wandb = None
        if jax.process_index() != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            import tensorflow as tf  # noqa

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        if wandb_opt and wandb_opt.get("project"):
            try:
                import wandb

                wandb.init(project=wandb_opt["project"],
                           resume="allow" if wandb_opt.get("resume_id")
                           else None,
                           id=wandb_opt.get("resume_id"))
                self._wandb = wandb
            except Exception:
                pass

    def write(self, step: int, scalars: dict):
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, **{
                k: float(v) for k, v in scalars.items()}}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({k: float(v) for k, v in scalars.items()},
                            step=step)


class MessageLogger:
    """epoch/iter/lr/eta/loss console line (reference utils/logger.py:33-77)."""

    def __init__(self, total_iters: int, start_iter: int = 0, writer=None,
                 logger=None):
        self.total_iters = total_iters
        self.start_iter = start_iter
        self.writer = writer
        self.logger = logger or get_root_logger()
        self.start_time = time.time()

    def __call__(self, epoch: int, itr: int, lrs, losses: dict,
                 iter_time: float = 0.0, data_time: float = 0.0):
        elapsed = time.time() - self.start_time
        done = max(itr - self.start_iter, 1)
        eta = elapsed / done * (self.total_iters - itr)
        eta_str = str(datetime.timedelta(seconds=int(eta)))
        lr_str = ", ".join(f"{lr:.3e}" for lr in (
            lrs if isinstance(lrs, (list, tuple)) else [lrs]))
        loss_str = " ".join(f"{k}: {float(v):.4e}" for k, v in losses.items())
        self.logger.info(
            f"[epoch:{epoch:3d}, iter:{itr:8,d}, lr:({lr_str})] "
            f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "
            f"{loss_str}")
        if self.writer is not None:
            self.writer.write(itr, losses)
