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
        self.closed = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for item in self.it:
                if self.closed:
                    return
                self.q.put(item)
                if self.closed:
                    return
        except BaseException as e:  # surfaced on next()
            self.err = e
        finally:
            if not self.closed:
                self.q.put(self._SENTINEL)

    def close(self):
        """Stop the producer thread (drain once so a blocked put returns).
        For infinite upstream iterators — e.g. device_batches over repeating
        pretrain streams — that would otherwise keep buffers alive."""
        self.closed = True
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self) -> Iterator:
        while True:
            item = self.q.get()
            if item is self._SENTINEL:
                if self.err is not None:
                    raise self.err
                return
            yield item


def device_batches(loader: Iterable, mesh, batch_axis: int = 0,
                   depth: int = 2) -> Prefetcher:
    """Host-batch iterator → device-resident (batch-sharded) iterator with
    the host→device transfer issued `depth` batches ahead on a daemon
    thread: double buffering, so H2D DMA (and the host-side collate) rides
    under the previous device step instead of sitting on the dispatch
    critical path. The reference gets this overlap from torch DataLoader
    worker processes + CUDA async copies (reference dataset/__init__.py:
    221-246); here `jax.device_put` is async and the thread adds the
    lookahead."""
    from ..core.mesh import shard_batch

    def gen():
        for b in loader:
            yield shard_batch(mesh, b, batch_axis=batch_axis)

    return Prefetcher(gen(), depth=depth)
