"""Threaded batching loader (the torch DataLoader equivalent).

Decoding + fbank are numpy-heavy and release the GIL inside BLAS/FFT, so a
thread pool gives real overlap without process-spawn costs; batches are
prefetched one ahead so host IO overlaps device compute.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from tpat_tpu.data.sampler import EpochShardSampler


def _collate(items):
    xs = np.stack([it[0] for it in items])
    ys = np.stack([it[1] for it in items])
    ids = [it[2] for it in items]
    return xs, ys, ids


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[EpochShardSampler] = None,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or EpochShardSampler(
            len(dataset), shuffle=shuffle, seed=seed
        )
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, list]]:
        idx = list(self.sampler)
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that re-checks stop: an abandoned iterator (NaN
            # abort, early break) would otherwise leave the producer parked
            # forever in q.put() on a full queue, leaking the thread pool
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, b))
                        if not put(_collate(items)):
                            return
            except BaseException as e:  # propagate, don't hang the consumer
                put(e)
                return
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    # re-raise a dataset/worker failure in the caller,
                    # like torch DataLoader propagates worker exceptions
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_iter(it, prefetch: int = 2):
    """Drain ``it`` on a background thread through a bounded queue so item
    production (WAV decode + fbank, which release the GIL) overlaps the
    consumer's device time — the producer half of ``DataLoader.__iter__``
    for an arbitrary iterator (used by the dist-eval shard generator,
    ``cli/finetune.dist_eval_batches``).

    Producer exceptions re-raise in the consumer; abandoning the returned
    generator (``close()``/GC) stops the producer thread (same bounded-put
    re-check as ``DataLoader`` so it cannot park forever on a full queue).
    """
    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    stop = threading.Event()
    done = object()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in it:
                if not put((item,)):
                    return
        except BaseException as e:  # propagate, don't hang the consumer
            put(e)
            return
        put(done)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            got = q.get()
            if got is done:
                return
            if isinstance(got, BaseException):
                raise got
            yield got[0]
    finally:
        stop.set()
