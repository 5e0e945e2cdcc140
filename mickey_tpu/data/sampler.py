"""Scene-balanced sampler (counterpart of lib/datasets/sampler.py).

Per epoch, draws ``n_samples_per_subset`` indices from each scene of a
ConcatDataset (with/without replacement), shuffles globally. Seeded with a
persistent numpy Generator so successive epochs differ unless
``reset_on_iter`` (deterministic validation).

For multi-host data parallelism, pass (shard_id, num_shards) to slice the
per-epoch index stream contiguously per host — the jax.sharding analog of
"the dataset is splitted across ranks" (reference sampler.py:17-18).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np


class RandomConcatSampler:
    def __init__(
        self,
        data_source,
        n_samples_per_subset: int,
        subset_replacement: bool = True,
        shuffle: bool = True,
        repeat: int = 1,
        seed: int = 66,
        reset_on_iter: bool = False,
        shard: Optional[Tuple[int, int]] = None,
    ):
        self.data_source = data_source
        self.n_subset = len(data_source.datasets)
        self.n_samples_per_subset = n_samples_per_subset
        self.n_samples = self.n_subset * n_samples_per_subset * repeat
        self.subset_replacement = subset_replacement
        self.repeat = repeat
        self.shuffle = shuffle
        self.seed = seed
        self.reset_on_iter = reset_on_iter
        self.shard = shard
        self.generator = np.random.default_rng(seed)
        assert repeat >= 1

    def __len__(self) -> int:
        n = self.n_samples
        if self.shard:
            n = n // self.shard[1]
        return n

    def __iter__(self) -> Iterator[int]:
        if self.reset_on_iter:
            self.generator = np.random.default_rng(self.seed)
        g = self.generator

        indices = []
        for d_idx in range(self.n_subset):
            low = 0 if d_idx == 0 else self.data_source.cumulative_sizes[d_idx - 1]
            high = self.data_source.cumulative_sizes[d_idx]
            if self.subset_replacement:
                rand = g.integers(low, high, size=self.n_samples_per_subset)
            else:
                len_subset = len(self.data_source.datasets[d_idx])
                rand = g.permutation(len_subset) + low
                if len_subset >= self.n_samples_per_subset:
                    rand = rand[: self.n_samples_per_subset]
                else:
                    pad = g.integers(low, high, size=self.n_samples_per_subset - len_subset)
                    rand = np.concatenate([rand, pad])
            indices.append(rand)
        indices = np.concatenate(indices)
        if self.shuffle:
            indices = indices[g.permutation(len(indices))]
        if self.repeat > 1:
            reps = [indices.copy() for _ in range(self.repeat - 1)]
            if self.shuffle:
                reps = [r[g.permutation(len(r))] for r in reps]
            indices = np.concatenate([indices, *reps])
        assert indices.shape[0] == self.n_samples
        if self.shard:
            sid, nsh = self.shard
            per = self.n_samples // nsh
            indices = indices[sid * per : (sid + 1) * per]
        return iter(indices.tolist())
