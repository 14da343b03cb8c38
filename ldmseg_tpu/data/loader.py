"""Threaded prefetching loader.

Replaces torch ``DataLoader(num_workers=8)`` + ``DistributedSampler``
(reference trainers_ae.py:159-204, trainers_ldm_cond.py:246-247): a
thread pool decodes/augments samples ahead of the train step while the TPU
computes. PNG decode releases the GIL inside PIL, so threads scale; a C++
decode path can slot in behind the same interface later.

Sharding: with a global-batch SPMD setup the loader yields the full global
batch on the host and ``parallel.shard_batch`` scatters it; in multi-host
setups pass (shard_id, num_shards) to iterate a per-host subset (the
``DistributedSampler`` equivalent, incl. per-epoch reshuffling via
``set_epoch`` semantics baked into the epoch argument).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .collate import collate


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_threads: Optional[int] = None,
        prefetch: int = 4,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        import os
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # default: one decode thread per core, capped at the reference's
        # num_workers=8; oversubscribing a small host serializes on the
        # GIL and loses (measured 5 vs 9.5 samples/s on a 1-core VM,
        # tools/perf/loader_bench.py)
        self.num_threads = (min(8, os.cpu_count() or 1)
                            if num_threads is None else num_threads)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards

    def _indices(self, epoch: int) -> np.ndarray:
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            # per-epoch reshuffle == DistributedSampler.set_epoch (:946)
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch]))
            rng.shuffle(idx)
        # pad so every shard sees the same count (DistributedSampler pads)
        per = -(-n // self.num_shards)
        padded = np.concatenate([idx, idx[: per * self.num_shards - n]])
        return padded[self.shard_id::self.num_shards]

    def __len__(self):
        per = -(-len(self.ds) // self.num_shards)
        if self.drop_last:
            return per // self.batch_size
        return -(-per // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        idx = self._indices(epoch)
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        work: queue.Queue = queue.Queue()
        done: dict = {}
        done_lock = threading.Condition()
        # bound decoded-but-unconsumed batches: without a window, workers
        # race through the whole epoch ahead of the train step and pile
        # every decoded batch in memory. A worker only STARTS batch bi
        # once bi falls inside [consumed, consumed + window); admission is
        # monotone in bi (FIFO work queue), so the earliest outstanding
        # batch is never starved and the consumer always makes progress.
        window = max(self.prefetch, 1) + self.num_threads
        consumed = [0]
        for bi, b in enumerate(batches):
            work.put((bi, b))

        def worker():
            while True:
                try:
                    bi, b = work.get_nowait()
                except queue.Empty:
                    return
                with done_lock:
                    while bi >= consumed[0] + window:
                        done_lock.wait()
                try:
                    samples = [self.ds.__getitem__(int(i), epoch=epoch)
                               for i in b]
                    batch = collate(samples)
                except Exception as e:  # surfaced on the consumer side
                    batch = e
                with done_lock:
                    done[bi] = batch
                    done_lock.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(min(self.num_threads, max(nb, 1)))]
        for t in threads:
            t.start()

        for bi in range(nb):
            with done_lock:
                while bi not in done:
                    done_lock.wait()
                batch = done.pop(bi)
                consumed[0] = bi + 1
                done_lock.notify_all()
            if isinstance(batch, Exception):
                raise batch
            yield batch

    def __iter__(self):
        return self.epoch(0)


def make_loader(dataset, batch_size: int, **kwargs) -> Loader:
    """Loader with per-process input sharding injected — the
    DistributedSampler equivalent for multihost SPMD (reference
    trainers_ldm_cond.py:246-247): each JAX process iterates a disjoint
    shard of every epoch, so ``batch_size`` is per-process. Single-process
    setups degrade to a plain Loader."""
    import jax
    kwargs.setdefault("shard_id", jax.process_index())
    kwargs.setdefault("num_shards", jax.process_count())
    return Loader(dataset, batch_size, **kwargs)
