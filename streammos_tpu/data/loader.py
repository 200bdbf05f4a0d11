"""Input pipeline: background prefetching plus a multi-process sample loader.

The reference feeds each GPU from 4 torch DataLoader worker processes
(`/root/reference/train_StreamMOS.py:143-150`). Here the per-point math
(quantize/featurize/BEV labels) lives in-graph on device
(`models.stream_mos.featurize`), but the train-time host work that remains —
file IO, ego alignment, copy-paste augmentation (Delaunay hulls), 3 windows
of filter/resample/augment — is still ~100s of ms of single-threaded numpy
per sample, enough to starve the chip at batch >= 2. `SampleWorkerPool`
mirrors the reference's worker-process design: forked workers run
`dataset[i]` in parallel (numpy releases the GIL poorly across processes,
so processes, not threads), the parent collates, and `PrefetchLoader`
overlaps collation/H2D with device compute."""
from __future__ import annotations

import multiprocessing as mp
import os
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence


class PrefetchLoader:
    """Wrap an iterator; a daemon thread keeps ``depth`` batches ready."""

    _DONE = object()

    def __init__(self, it: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surface worker errors to the consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


# ---------------------------------------------------------------------------
# Multi-process sample loading (torch DataLoader num_workers parity)

_WORKER_DS = None


def _worker_init(dataset, base_seed: int) -> None:
    global _WORKER_DS
    _WORKER_DS = dataset
    # independent augmentation stream per worker (forked rng state would
    # otherwise make every worker draw identical augmentations)
    ident = mp.current_process()._identity
    wid = ident[0] if ident else 0
    if hasattr(dataset, "reseed"):
        dataset.reseed(base_seed + 1000 * wid)


def _worker_get(index: int):
    return _WORKER_DS[index]


class SampleWorkerPool:
    """Run ``dataset[i]`` across forked worker processes.

    ``num_workers=0`` degrades to inline loading (useful for debugging and
    for datasets that are already cheap). Workers never touch jax — the
    dataset is pure numpy — so forking after TPU-client initialization is
    safe (the child inherits no live client threads and makes no device
    calls)."""

    def __init__(self, dataset, num_workers: int, seed: int = 0):
        # leave 2 cores for the parent (collation + H2D + device dispatch);
        # on tiny hosts workers only add IPC cost over inline loading
        # (measured: 1 worker = 0.31 s/sample vs 0.22 inline on 2 vCPUs;
        # production TPU hosts have >= 96 cores where 4 workers pipeline
        # cleanly, reference parity train_StreamMOS.py:146)
        cores = os.cpu_count() or 1
        num_workers = min(num_workers, max(cores - 2, 0))
        self.dataset = dataset
        self.num_workers = num_workers
        self._pool = None
        if num_workers > 0:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(num_workers, initializer=_worker_init,
                                  initargs=(dataset, seed))

    def map_ordered(self, indices: Sequence[int]) -> Iterator:
        """Yield dataset[i] for each index, in order, loaded in parallel."""
        if self._pool is None:
            for i in indices:
                yield self.dataset[int(i)]
            return
        yield from self._pool.imap(_worker_get, [int(i) for i in indices],
                                   chunksize=1)

    def batches(self, indices: Sequence[int], batch_size: int,
                collate: Callable[[List], object]) -> Iterator:
        """Collated fixed-size batches over ``indices`` (tail dropped — the
        caller pads indices to a multiple, see parallel.process_shard_indices)."""
        buf: List = []
        for sample in self.map_ordered(indices):
            buf.append(sample)
            if len(buf) == batch_size:
                yield collate(buf)
                buf = []

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
