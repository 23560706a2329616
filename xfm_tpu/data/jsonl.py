"""Sharded JSONL line-stream reader
(reference dataset/dist_dataset.py:19-95 DistLineReadingDataset).

Behavioral parity: the file list is split by *contiguous range* across data
ranks (reference dist_dataset.py:89-95 split_shard), then again across
loader workers (:57-67); shuffling happens at file granularity (:54,69-70);
the stream repeats forever for IterableDataset-style training (:52,82-83).

TPU-native deltas: "rank" is the jax process index; HDFS subprocess piping
(reference utils/hdfs_io.py) is replaced by the pluggable `xfm_tpu.data.io`
opener (local / gs:// / hdfs://).
"""
from __future__ import annotations

import json
from typing import Iterable, Iterator, Sequence

import numpy as np

from .io import open_file, list_files


def split_shard(items: Sequence, rank: int, world_size: int):
    """Contiguous range split (reference dist_dataset.py:89-95)."""
    n = len(items)
    if n < world_size:
        raise RuntimeError(f"{n} shards < {world_size} ranks")
    start = (rank * n) // world_size
    end = ((rank + 1) * n) // world_size
    return items[start:end]


class ShardedLineReader:
    """Infinite (or single-epoch) iterator over JSONL shard files."""

    def __init__(self, files: str | Sequence[str], rank: int = 0,
                 world_size: int = 1, shuffle: bool = True,
                 repeat: bool = True, seed: int = 0):
        if isinstance(files, str):
            files = [files]
        expanded: list[str] = []
        for f in files:
            expanded.extend(list_files(f))
        if not expanded:
            raise FileNotFoundError(f"no data files matched {files}")
        self.files = sorted(expanded)
        self.rank, self.world_size = rank, world_size
        self.shuffle, self.repeat = shuffle, repeat
        self.seed = seed

    def __iter__(self) -> Iterator[str]:
        epoch = 0
        while True:
            files = list(self.files)
            if self.shuffle:
                rng = np.random.default_rng(self.seed + epoch)
                rng.shuffle(files)
            mine = split_shard(files, self.rank, self.world_size)
            for path in mine:
                with open_file(path, "r") as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            yield line
            epoch += 1
            if not self.repeat:
                return

    def iter_json(self) -> Iterator[dict]:
        for line in self:
            try:
                item = json.loads(line)
            except json.JSONDecodeError:
                continue  # broken line: skip-and-continue
                # (reference dataset/pretrain_dataset.py:258-262 semantics)
            yield item
