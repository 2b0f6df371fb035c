"""Grain-backed data loading with device prefetch.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler stack (`src/training/data.py:462-593`): Grain gives
deterministic sharded sampling, multiprocess workers, and checkpointable
iterators; a small prefetcher overlaps host->device transfer (with the batch
dim sharded over the mesh) against the running step.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def make_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    drop_remainder: bool = True,
):
    """Build a grain DataLoader over an indexable dataset returning dicts."""
    import grain.python as pg

    sampler = pg.IndexSampler(
        num_records=len(dataset),
        shard_options=pg.ShardOptions(
            shard_index=shard_index, shard_count=shard_count, drop_remainder=drop_remainder
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    return pg.DataLoader(
        data_source=dataset,
        sampler=sampler,
        operations=[pg.Batch(batch_size=batch_size, drop_remainder=drop_remainder)],
        worker_count=worker_count,
    )


def device_prefetch(
    it: Iterable[dict],
    mesh=None,
    size: int = 2,
) -> Iterator[dict]:
    """Prefetch batches onto device (sharded over `data` if mesh given)."""
    from clipself_tpu.parallel.mesh import shard_batch

    if mesh is None:
        put = lambda b: jax.tree.map(jax.device_put, b)
    else:
        put = lambda b: shard_batch(mesh, b)

    queue = collections.deque()
    it = iter(it)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class SyntheticDistillData:
    """Deterministic synthetic batches shaped like GridDistillDataset items —
    for benches, smoke tests, and the no-data smoke-train path."""

    def __init__(self, batch_size=2, det_size=1024, crop_size=224, max_anns=20, seed=0):
        rng = np.random.default_rng(seed)
        b, m = batch_size, max_anns
        lo = rng.uniform(0, 0.5, (b, m, 2)).astype(np.float32)
        hi = np.clip(lo + rng.uniform(0.05, 0.5, (b, m, 2)), 0, 1).astype(np.float32)
        self.batch = {
            "images": rng.normal(size=(b, det_size, det_size, 3)).astype(np.float32),
            "boxes": np.concatenate([lo, hi, np.ones((b, m, 1), np.float32)], -1),
            "crops": rng.normal(size=(b, m, crop_size, crop_size, 3)).astype(np.float32),
        }

    def __iter__(self):
        while True:
            yield self.batch
