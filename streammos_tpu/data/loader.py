"""Input-pipeline glue: background prefetching so host-side sample assembly
overlaps device compute (the reference leans on torch DataLoader worker
processes, `train_StreamMOS.py:143-150`; here a thread pool suffices because
the heavy per-point math lives in-graph on device — see
`models.stream_mos.featurize`)."""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


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
