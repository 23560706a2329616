"""Storage IO (reference utils/hdfs_io.py, utils/torch_io.py).

The reference shells out to the hadoop CLI for every HDFS access
(reference utils/hdfs_io.py:17,32-52). Here a single pluggable opener covers
local paths, `hdfs://` (still via CLI when present) and `gs://` (via
tf.io.gfile when tensorflow is importable) — the TPU-native storage being GCS.

API surface kept: hopen/hlist_files/hexists/hmkdir/hcopy/hcountline
(reference utils/hdfs_io.py:19) under the names open_file/list_files/exists/
makedirs/copy/count_lines.
"""
from __future__ import annotations

import glob as _glob
import io
import os
import shutil
import subprocess
from contextlib import contextmanager
from typing import IO, Iterator


def _is_hdfs(path: str) -> bool:
    return path.startswith("hdfs://")


def _is_gcs(path: str) -> bool:
    return path.startswith("gs://")


def _gfile():
    from tensorflow.io import gfile  # lazy; heavy import

    return gfile


@contextmanager
def open_file(path: str, mode: str = "r") -> Iterator[IO]:
    """Open local / gs:// / hdfs:// files (reference utils/hdfs_io.py:19-52
    hopen)."""
    if _is_gcs(path):
        with _gfile().GFile(path, mode) as f:
            yield f
        return
    if _is_hdfs(path):
        if "r" in mode:
            proc = subprocess.Popen(f"hdfs dfs -text {path}", shell=True,
                                    stdout=subprocess.PIPE)
            try:
                yield io.TextIOWrapper(proc.stdout) if "b" not in mode \
                    else proc.stdout
            finally:
                proc.stdout.close()
                proc.wait()
            return
        flag = "-appendToFile" if "a" in mode else "-put -f"
        proc = subprocess.Popen(f"hdfs dfs {flag} - {path}", shell=True,
                                stdin=subprocess.PIPE)
        try:
            yield io.TextIOWrapper(proc.stdin) if "b" not in mode \
                else proc.stdin
        finally:
            proc.stdin.close()
            proc.wait()
        return
    if "w" in mode or "a" in mode:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, mode) as f:
        yield f


def list_files(pattern: str) -> list[str]:
    """Expand a path / glob / dir into files (reference utils/hdfs_io.py:55,176)."""
    if _is_gcs(pattern):
        g = _gfile()
        if g.isdir(pattern):
            return sorted(g.glob(os.path.join(pattern, "*")))
        return sorted(g.glob(pattern)) or ([pattern] if g.exists(pattern)
                                           else [])
    if _is_hdfs(pattern):
        out = subprocess.run(f"hdfs dfs -ls {pattern}", shell=True,
                             capture_output=True, text=True).stdout
        return sorted(line.split()[-1] for line in out.splitlines()
                      if line.startswith("-") or line.startswith("d"))
    if os.path.isdir(pattern):
        return sorted(
            os.path.join(pattern, f) for f in os.listdir(pattern)
            if os.path.isfile(os.path.join(pattern, f)))
    hits = sorted(_glob.glob(pattern))
    if hits:
        return hits
    return [pattern] if os.path.exists(pattern) else []


def exists(path: str) -> bool:
    if _is_gcs(path):
        return _gfile().exists(path)
    if _is_hdfs(path):
        return subprocess.run(f"hdfs dfs -test -e {path}",
                              shell=True).returncode == 0
    return os.path.exists(path)


def makedirs(path: str) -> None:
    if _is_gcs(path):
        _gfile().makedirs(path)
    elif _is_hdfs(path):
        subprocess.run(f"hdfs dfs -mkdir -p {path}", shell=True, check=False)
    else:
        os.makedirs(path, exist_ok=True)


def copy(src: str, dst: str) -> None:
    if not (_is_gcs(src) or _is_gcs(dst) or _is_hdfs(src) or _is_hdfs(dst)):
        shutil.copy(src, dst)
    elif _is_gcs(src) or _is_gcs(dst):
        _gfile().copy(src, dst, overwrite=True)
    else:
        subprocess.run(f"hdfs dfs -cp -f {src} {dst}", shell=True,
                       check=False)


def count_lines(path: str) -> int:
    n = 0
    with open_file(path, "r") as f:
        for _ in f:
            n += 1
    return n


def fetch_many(paths: list[str], target_dir: str,
               num_threads: int = 16) -> list[str]:
    """Parallel fetch of remote files into target_dir (reference
    utils/hdfs_io.py:147 `hmget`). Returns the local paths, in order."""
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(target_dir, exist_ok=True)
    locals_ = [os.path.join(target_dir, os.path.basename(p)) for p in paths]

    def one(src_dst):
        src, dst = src_dst
        copy(src, dst)
        return dst

    with ThreadPoolExecutor(max_workers=num_threads) as ex:
        return list(ex.map(one, zip(paths, locals_)))


def glob_files(pattern: str) -> list[str]:
    """Glob across local/gs/hdfs schemes (reference utils/hdfs_io.py:176
    `hglob`). Unlike list_files, a non-matching pattern returns []."""
    if _is_gcs(pattern):
        return sorted(_gfile().glob(pattern))
    if _is_hdfs(pattern):
        out = subprocess.run(f"hdfs dfs -ls {pattern}", shell=True,
                             capture_output=True, text=True).stdout
        return sorted(line.split()[-1] for line in out.splitlines()
                      if line.startswith("-") or line.startswith("d"))
    return sorted(_glob.glob(pattern))
