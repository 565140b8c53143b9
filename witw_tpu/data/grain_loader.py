"""Grain-backed input pipeline: deterministic, checkpointable, multi-host.

Alternative to :class:`witw_tpu.data.loader.PairLoader` built on Google
Grain. Same batch contract ({'surface', 'overhead', 'idx'} numpy arrays);
what it adds over the thread/process-pool loader:

- **determinism**: the sample order is a pure function of (seed, epoch) and
  the element index — stable across restarts, worker counts and hosts,
- **multi-host sharding**: each process reads only its 1/num_shards of the
  global order (grain.sharding), composing with
  parallel.mesh.global_batch_from_local for pod training,
- **resumable iteration**: grain iterators checkpoint their position.

The reference has none of this (torch DataLoader with nondeterministic
worker scheduling, reference model/cvig_fov.py:402-403).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from witw_tpu.data.loader import _decode_pair


class _PairSource:
    """Random-access source over (surface_path, overhead_path) pairs."""

    def __init__(self, pairs, surface_hw, overhead_hw, channels, dtype,
                 skip_errors):
        self._pairs = list(pairs)
        self._args = (surface_hw, overhead_hw, channels, dtype, skip_errors)

    def __len__(self) -> int:
        return len(self._pairs)

    def __getitem__(self, idx: int):
        surface, overhead = _decode_pair((self._pairs[idx],) + self._args)
        return {"surface": surface, "overhead": overhead,
                "idx": np.int32(idx)}


class GrainPairLoader:
    """Iterable of batches, grain-executed. Drop-in for PairLoader where
    determinism/multi-host sharding matter more than raw single-host decode
    throughput."""

    def __init__(
        self,
        pairs: Sequence[Tuple[str, str]],
        batch_size: int,
        surface_hw: Tuple[int, int],
        overhead_hw: Tuple[int, int],
        channels: int = 3,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        dtype=np.uint8,
        skip_errors: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """``shard_index``/``shard_count``: this process' slice of the global
        order (multi-host: pass jax.process_index()/jax.process_count()).
        ``num_workers`` > 0 decodes in grain worker processes."""
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0
        self._source = _PairSource(
            pairs, surface_hw, overhead_hw, channels, dtype, skip_errors
        )

    def __len__(self) -> int:
        # this shard's element count under [shard_index::shard_count] slicing
        n = len(
            range(self.shard_index, len(self._source), self.shard_count)
        )
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _dataset(self, epoch: int):
        import grain

        ds = grain.MapDataset.source(self._source)
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed + epoch)
        if self.shard_count > 1:
            ds = ds[self.shard_index :: self.shard_count]
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        it = ds.to_iter_dataset()
        if self.num_workers > 0:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers)
            )
        return it

    def __iter__(self):
        epoch = self.epoch
        self.epoch += 1
        for batch in self._dataset(epoch):
            yield {
                "surface": np.asarray(batch["surface"]),
                "overhead": np.asarray(batch["overhead"]),
                "idx": np.asarray(batch["idx"], np.int32),
            }
