"""Grain-based input pipeline (production alternative to data/loader.py).

Wraps the framework's datasets as a Grain ``RandomAccessDataSource`` and
builds a ``grain.python.DataLoader`` with multiprocess workers — the
JAX-ecosystem equivalent of torch's worker-process DataLoader
(reference:train.py:137-147), with deterministic per-record seeding.

Augmentation randomness: Grain workers are separate processes, so the
reference's shared-global-``random`` pattern would de-synchronize; each
``__getitem__`` here seeds a private RNG from (seed, epoch, index),
making every record reproducible independently of worker scheduling —
a determinism upgrade the reference cannot express. Epoch diversity
comes from building one Grain loader per epoch with an epoch-mixed
seed (Grain's record keys don't carry the epoch, so the source must be
reseeded between epochs).

Select with ``--loader grain`` in the trainer; falls back to the
threaded loader when grain is unavailable.
"""

from __future__ import annotations

import random as _random
import threading
import weakref

import numpy as np

__all__ = ["GrainDataLoader", "make_grain_loader"]

# One augmentation lock per dataset OBJECT (not per source): two sources
# over the same dataset — or grain's prefetch thread racing the caller —
# would interleave the RNG swaps in __getitem__ and feed one record's RNG
# to another. Kept in a module-level weak map so the source (and the
# dataset) stay picklable for multiprocess workers; each worker process
# simply gets its own lock for its own dataset copy.
_AUG_LOCKS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_AUG_LOCKS_GUARD = threading.Lock()


def _aug_lock(dataset):
    with _AUG_LOCKS_GUARD:
        lock = _AUG_LOCKS.get(dataset)
        if lock is None:
            lock = threading.Lock()
            _AUG_LOCKS[dataset] = lock
        return lock


class _DatasetSource:
    """Grain RandomAccessDataSource over one of our datasets, with
    per-record deterministic augmentation RNG. Picklable (the lock lives
    in the module-level weak map, not on the instance or the dataset)."""

    def __init__(self, dataset, seed: int = 0):
        self.dataset = dataset
        self.seed = seed

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        # Private, record-deterministic RNG for the PIL augmentations.
        rng = _random.Random(self.seed * 1_000_003 + index)
        with _aug_lock(self.dataset):
            tf = getattr(self.dataset, "tf", None)
            old = None
            if tf is not None:
                old = tf.rng
                tf.rng = rng
            inner = getattr(self.dataset, "_rng", None)
            if inner is not None:
                self.dataset._rng = rng
            try:
                image, target = self.dataset[index]
            finally:
                if tf is not None:
                    tf.rng = old
                if inner is not None:
                    self.dataset._rng = inner
        return {"image": np.asarray(image), "target": np.asarray(target)}


class GrainDataLoader:
    """Iterable of (images u8 NHWC, targets i32 NHW) numpy batches.

    ``num_epochs`` > 1 iterates that many epochs back to back, building a
    fresh Grain loader per epoch with seed ``seed + epoch`` — so both the
    shuffle order AND the per-record augmentations differ between epochs
    while staying fully deterministic."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 0,
        seed: int = 0,
        num_epochs: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.num_epochs = num_epochs
        n = len(dataset)
        self._len = (n // batch_size if drop_last else -(-n // batch_size)) * num_epochs

    def _epoch_loader(self, epoch: int):
        import grain.python as gp

        source = _DatasetSource(self.dataset, seed=self.seed + epoch)
        sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + epoch,
        )
        # NO Batch operation here: grain applies operations INSIDE each
        # worker process, so a per-worker Batch(drop_remainder) silently
        # drops each worker's partial tail — with num_records/workers <
        # batch_size an epoch yields ZERO batches (found measuring the
        # 24-image fixture set with 4 workers, bench_input.py). Workers
        # do the expensive decode+augment; the parent assembles batches
        # from the merged record stream below.
        return gp.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[],
            worker_count=self.num_workers,
        )

    def __len__(self):
        return self._len

    def __iter__(self):
        for epoch in range(self.num_epochs):
            images, targets = [], []
            for rec in self._epoch_loader(epoch):
                images.append(rec["image"])
                targets.append(rec["target"])
                if len(images) == self.batch_size:
                    yield np.stack(images), np.stack(targets).astype(np.int32)
                    images, targets = [], []
            if images and not self.drop_last:
                yield np.stack(images), np.stack(targets).astype(np.int32)


def make_grain_loader(dataset, **kwargs):
    """Build a GrainDataLoader, or None if grain is unavailable."""
    try:
        import grain.python  # noqa: F401
    except Exception:
        return None
    return GrainDataLoader(dataset, **kwargs)
