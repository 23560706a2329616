"""Metric logging (reference utils/__init__.py:100-311 MetricLogger /
SmoothedValue).

TPU-native: cross-host sync of meters is a `psum` of [count, total] via
`jax.experimental.multihost_utils` (replacing the all_reduce at
reference utils/__init__.py:118-129); printing is gated to process 0 like the
reference's rank-0 print monkey-patch (reference utils/__init__.py:344-356).
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable

import jax
import numpy as np


def is_main_process() -> bool:
    return jax.process_index() == 0


class SmoothedValue:
    """Windowed + global average meter (reference utils/__init__.py:100-160)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """psum [count, total] across hosts (reference :118-129)."""
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], np.float64)
        arr = np.asarray(
            multihost_utils.process_allgather(arr)).sum(axis=0)
        self.count = int(arr[0])
        self.total = float(arr[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg,
                               value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = float(v)
            self.meters[k].update(v)

    def add_meter(self, name, meter):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in
                                   self.meters.items())

    def global_avg(self) -> dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: int | None = None):
        """Yield batches, printing rate/ETA every `print_freq` steps
        (reference utils/__init__.py:205-260)."""
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for i, obj in enumerate(iterable):
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            end = time.time()
            if i % print_freq == 0 and is_main_process():
                eta = ""
                if total:
                    secs = iter_time.global_avg * (total - i)
                    eta = f" eta: {datetime.timedelta(seconds=int(secs))}"
                print(f"{header} [{i}{f'/{total}' if total else ''}]{eta}  "
                      f"{self}  iter: {iter_time}  data: {data_time}",
                      flush=True)
        if is_main_process():
            span = datetime.timedelta(seconds=int(time.time() - start))
            print(f"{header} Total time: {span}", flush=True)
