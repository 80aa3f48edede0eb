"""Sharded enlarged sampler (reference data/data_sampler.py:6-49).

Epoch-seeded random permutation over dataset * enlarge_ratio, strided by
process rank — so iteration-based training never exhausts an 'epoch' and each
host reads a disjoint shard.  On TPU the 'rank' is jax.process_index()."""

from __future__ import annotations

import numpy as np


class EnlargedSampler:
    def __init__(self, num_samples: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 1):
        self.num_samples_raw = num_samples
        self.num_replicas = num_replicas
        self.rank = rank
        self.total_size = int(
            np.ceil(num_samples * ratio / num_replicas)) * num_replicas
        self.per_rank = self.total_size // num_replicas
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.per_rank

    def __iter__(self):
        g = np.random.RandomState(self.epoch)
        indices = g.permutation(self.total_size)
        indices = indices % self.num_samples_raw
        return iter(indices[self.rank :: self.num_replicas].tolist())
