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


class NativeDistillLoader:
    """Batch iterator over a distill dataset using the C++ loader core.

    Items whose `plan_item` is available (grid mode without pre-transforms)
    are decoded/resized/normalized by the native thread pool straight into
    the batch buffers; anything else — including decode failures — falls back
    to the dataset's PIL `__getitem__`. Yields the same dict schema as the
    grain loader.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: Optional[int] = None,
        crop_size: Optional[int] = None,
    ):
        from clipself_tpu.core.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD
        from clipself_tpu.data.native_loader import NativePool, available

        if not available():
            raise RuntimeError("native loader not built; run `make -C native`")
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pool = NativePool(num_threads)
        self._num_threads = num_threads
        self._aux_pool = None  # second double-buffer half, created lazily
        self.mean = np.asarray(OPENAI_DATASET_MEAN, np.float32)
        self.std = np.asarray(OPENAI_DATASET_STD, np.float32)
        self.crop_size = crop_size or dataset.crop_size

    def _indices(self):
        if len(self.ds) < self.batch_size:
            raise ValueError(
                f"dataset ({len(self.ds)} items) smaller than batch size "
                f"{self.batch_size} — no full batch can ever be yielded"
            )
        # the DATASET's epoch is authoritative (the trainer advances it via
        # set_epoch on resume and at each epoch, reference data.py:608-618
        # DataInfo.set_epoch); the loader only self-advances in standalone
        # use, when nobody else moved it during the chunk. Note the one-batch
        # prefetch skew: the first batch after a boundary may have been
        # planned under the previous epoch's rng.
        local_epoch = int(getattr(self.ds, "epoch", 0))
        while True:
            # datasets without an `epoch` attribute still get a fresh
            # shuffle each pass via the local counter
            epoch = int(getattr(self.ds, "epoch", local_epoch))
            order = (
                np.random.default_rng((self.seed, epoch)).permutation(len(self.ds))
                if self.shuffle
                else np.arange(len(self.ds))
            )
            b = self.batch_size
            for start in range(0, len(order) - b + 1, b):
                yield order[start : start + b]
            if int(getattr(self.ds, "epoch", epoch)) == epoch and hasattr(
                self.ds, "set_epoch"
            ):
                self.ds.set_epoch(epoch + 1)
            local_epoch = epoch + 1

    def _submit(self, pool, idxs):
        b = self.batch_size
        s = self.ds.det_size
        m = self.ds.max_anns
        cs = self.crop_size
        buf = {
            "images": np.zeros((b, s, s, 3), np.float32),
            "crops": np.zeros((b, m, cs, cs, 3), np.float32),
            "boxes": np.zeros((b, m, 5), np.float32),
        }
        slow = []
        submitted = []  # batch row per submitted job, in submission order
        for j, idx in enumerate(idxs):
            plan = self.ds.plan_item(int(idx))
            if plan is None:
                slow.append(j)
                continue
            buf["boxes"][j] = plan["boxes"]
            pool.submit_distill_item(
                plan["path"], buf["images"][j], buf["crops"][j],
                plan["crop_windows"], self.mean, self.std,
            )
            submitted.append(j)
        return buf, slow, submitted, idxs

    def _finish(self, pool, buf, slow, submitted, idxs):
        status = pool.wait_status(len(submitted))
        # per-job flags confine the PIL fallback to the rows that failed
        slow = list(slow) + [j for j, ok in zip(submitted, status) if not ok]
        for j in slow:
            item = self.ds[int(idxs[j])]
            buf["images"][j] = item["images"]
            buf["crops"][j] = item["crops"]
            buf["boxes"][j] = item["boxes"]
        return buf

    def __iter__(self):
        """Double-buffered: while the trainer consumes batch k, the pool is
        already decoding batch k+1 (the role of torch DataLoader's prefetch
        workers in the reference)."""
        from clipself_tpu.data.native_loader import NativePool

        if self._aux_pool is None:
            # same thread budget as the primary half, reused across
            # iterators (a fresh default-size pool per iter() would spawn
            # cpu_count threads each restart and leak until GC)
            self._aux_pool = NativePool(self._num_threads)
        pools = [self.pool, self._aux_pool]
        it = self._indices()
        pending = self._submit(pools[0], next(it))
        slot = 0
        while True:
            nxt_slot = 1 - slot
            nxt = self._submit(pools[nxt_slot], next(it))
            yield self._finish(pools[slot], *pending)
            pending, slot = nxt, nxt_slot


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
