"""Threaded prefetching data loader.

Replaces ``torch.utils.data.DataLoader`` (reference:train.py:137-147)
without torch: a thread pool decodes/augments samples (PIL releases the
GIL during JPEG/PNG decode) while the accelerator trains on the previous
batch. Batches are numpy ``(images u8 NHWC, targets i32 NHW)`` — padding
to a common shape happens only when samples disagree (testval mode
should instead use the evaluator's bucket-and-pad policy).

Determinism note: datasets draw augmentation randomness from the global
``random`` module (reference semantics), so with >1 worker thread the
stream interleaves nondeterministically. Use ``num_workers=1`` for exact
reproducibility, or the Grain loader (``data/grain_loader.py``) whose
per-record seeding is reproducible at any worker count.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    @staticmethod
    def _collate(samples, ignore_label: int = -1):
        images = [np.asarray(s[0]) for s in samples]
        targets = [np.asarray(s[1]) for s in samples]
        if len({im.shape for im in images}) > 1:
            # mixed native resolutions (testval mode): zero-pad images and
            # ignore-pad targets to the batch max so the stack is legal
            h = max(im.shape[0] for im in images)
            w = max(im.shape[1] for im in images)
            images = [
                np.pad(im, ((0, h - im.shape[0]), (0, w - im.shape[1]), (0, 0)))
                for im in images
            ]
            targets = [
                np.pad(
                    t, ((0, h - t.shape[0]), (0, w - t.shape[1])),
                    constant_values=ignore_label,
                )
                for t in targets
            ]
        return np.stack(images), np.stack(targets)

    def __iter__(self):
        batch_iter = self._batches()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that aborts promptly if the consumer went away
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # Any failure must reach the consumer: a producer that dies
            # without a sentinel leaves the training loop blocked forever
            # on out_q.get() with the error only on stderr.
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in batch_iter:
                        if stop.is_set():
                            break
                        samples = list(pool.map(self.dataset.__getitem__, idx))
                        if not put_or_stop(self._collate(samples)):
                            return
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                put_or_stop(("__error__", e))
                return
            put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch[0], str) and batch[0] == "__error__":
                    raise batch[1]
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
