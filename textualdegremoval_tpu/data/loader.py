"""Threaded host dataloader + device prefetcher.

TPU-native replacement for the reference's PrefetchDataLoader /
CUDAPrefetcher (data/prefetch_dataloader.py:7-126): worker threads decode and
augment on host; a double-buffered `jax.device_put` keeps the next batch in
HBM while the current step runs (CUDA side-stream equivalent)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np
import jax


_ARRAY_KEYS = ("lq", "gt", "ref")


def collate(samples: list[dict]) -> dict:
    """Stack numpy arrays; keep metadata lists."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Minimal but production-shaped loader: sampler-driven, N worker
    threads, bounded queue, deterministic per-sample order within a batch."""

    def __init__(self, dataset, batch_size: int, sampler=None,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch_batches: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        indices = list(self.sampler) if self.sampler is not None else list(
            range(len(self.dataset)))
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        idx_q: queue.Queue = queue.Queue()
        for bi, b in enumerate(batches):
            idx_q.put((bi, b))

        results: dict[int, dict] = {}
        cond = threading.Condition()
        stop = threading.Event()
        # In-flight bound: a worker must hold a permit to decode a batch; the
        # consumer returns the permit when it takes the batch.  Decoded-but-
        # unconsumed + being-decoded batches never exceed prefetch_batches,
        # so a stalled consumer cannot make the pool decode the whole epoch
        # ahead (unbounded host memory on large-image datasets).
        permits = threading.Semaphore(max(1, self.prefetch_batches))

        def worker():
            while not stop.is_set():
                if not permits.acquire(timeout=0.1):
                    continue
                try:
                    bi, batch_idx = idx_q.get_nowait()
                except queue.Empty:
                    permits.release()
                    return
                try:
                    samples = [self.dataset[i] for i in batch_idx]
                    out = collate(samples)
                except Exception as e:  # surface errors to the consumer
                    out = e
                with cond:
                    results[bi] = out
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for bi in range(len(batches)):
                with cond:
                    while bi not in results:
                        cond.wait(timeout=0.1)
                    out = results.pop(bi)
                permits.release()
                if isinstance(out, Exception):
                    raise out
                yield out
        finally:
            stop.set()


class DevicePrefetcher:
    """Double-buffered host->HBM transfer: always keeps the next batch's
    device_put in flight (async dispatch) while the step consumes the
    current one."""

    def __init__(self, loader, sharding=None):
        self.loader = loader
        self.sharding = sharding

    def _put(self, batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                out[k] = (jax.device_put(v, self.sharding)
                          if self.sharding is not None else jax.device_put(v))
            else:
                out[k] = v
        return out

    def __iter__(self):
        it = iter(self.loader)
        try:
            nxt = self._put(next(it))
        except StopIteration:
            return
        for batch in it:
            cur, nxt = nxt, self._put(batch)  # next transfer dispatched async
            yield cur
        yield nxt
