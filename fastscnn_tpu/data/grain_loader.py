"""Grain-based input pipeline (production alternative to data/loader.py).

Wraps the framework's datasets as a Grain ``RandomAccessDataSource`` and
builds a ``grain.python.DataLoader`` with multiprocess workers — the
JAX-ecosystem equivalent of torch's worker-process DataLoader
(reference:train.py:137-147), with deterministic per-record seeding.

Augmentation randomness: Grain workers are separate processes, so the
reference's shared-global-``random`` pattern would de-synchronize; each
``__getitem__`` here seeds a private RNG from (seed, epoch, index),
making every record reproducible independently of worker scheduling —
a determinism upgrade the reference cannot express.

Select with ``--loader grain`` in the trainer; falls back to the
threaded loader when grain is unavailable.
"""

from __future__ import annotations

import random as _random
import threading

import numpy as np

__all__ = ["GrainDataLoader", "make_grain_loader"]


class _DatasetSource:
    """Grain RandomAccessDataSource over one of our datasets, with
    per-record deterministic augmentation RNG."""

    def __init__(self, dataset, seed: int = 0):
        self.dataset = dataset
        self.seed = seed
        # __getitem__ temporarily swaps the dataset's augmentation RNG.
        # Two loaders over the SAME dataset object (or grain's prefetch
        # thread racing the caller) would interleave those swaps and feed
        # one record's RNG to another, so all sources serialize on a lock
        # stored on the dataset itself. Multiprocess workers are
        # unaffected: each worker unpickles its own dataset copy.
        if not hasattr(dataset, "_aug_rng_lock"):
            dataset._aug_rng_lock = threading.Lock()
        self._lock = dataset._aug_rng_lock

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index: int):
        # Private, record-deterministic RNG for the PIL augmentations.
        rng = _random.Random(self.seed * 1_000_003 + index)
        with self._lock:
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
    """Iterable of (images u8 NHWC, targets i32 NHW) numpy batches."""

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
        import grain.python as gp

        self.batch_size = batch_size
        source = _DatasetSource(dataset, seed=seed)
        sampler = gp.IndexSampler(
            num_records=len(source),
            shard_options=gp.NoSharding(),
            shuffle=shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        self._loader = gp.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[gp.Batch(batch_size=batch_size, drop_remainder=drop_last)],
            worker_count=num_workers,
        )
        n = len(source)
        self._len = (n // batch_size if drop_last else -(-n // batch_size)) * num_epochs

    def __len__(self):
        return self._len

    def __iter__(self):
        for batch in self._loader:
            yield batch["image"], batch["target"].astype(np.int32)


def make_grain_loader(dataset, **kwargs):
    """Build a GrainDataLoader, or None if grain is unavailable."""
    try:
        import grain.python  # noqa: F401
    except Exception:
        return None
    return GrainDataLoader(dataset, **kwargs)
