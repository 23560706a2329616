"""Host-side pipeline utilities: background prefetch + native-decode batching.

The reference gets input parallelism from torch DataLoader worker processes
(reference dataset/__init__.py:221-246). Here: a thread prefetcher (the
stream iterators are numpy-producing Python generators) + the C++ loader
(xfm_tpu.native) for decode/resize, keeping the TPU step off the host
critical path.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class Prefetcher:
    """Wrap an iterator; a daemon thread keeps `depth` batches ready."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, depth: int = 2):
        self.it = iter(iterable)
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.err: BaseException | None = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for item in self.it:
                self.q.put(item)
        except BaseException as e:  # surfaced on next()
            self.err = e
        finally:
            self.q.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            item = self.q.get()
            if item is self._SENTINEL:
                if self.err is not None:
                    raise self.err
                return
            yield item
