"""Native (C++) host runtime: threaded image decode/transform loader.

Compiled on demand with g++ (no pybind11 in the image — plain C ABI via
ctypes). Falls back to PIL transparently when the toolchain or libjpeg/libpng
are unavailable; `xfm_tpu.data` consumes it through `decode_batch`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "libxfmloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o",
           _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=180)
        return res.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.xfm_decode_batch.restype = ctypes.c_int
        lib.xfm_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.xfm_image_dims.restype = ctypes.c_int
        lib.xfm_image_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.xfm_image_dims_fast.restype = ctypes.c_int
        lib.xfm_image_dims_fast.argtypes = lib.xfm_image_dims.argtypes
        lib.xfm_decode_batch_status.restype = ctypes.c_int
        lib.xfm_decode_batch_status.argtypes = (
            list(lib.xfm_decode_batch.argtypes)
            + [ctypes.POINTER(ctypes.c_int)])
        try:  # absent in pre-built .so from before the RandAugment section
            lib.xfm_randaugment_batch.restype = ctypes.c_int
            lib.xfm_randaugment_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ]
        except AttributeError:
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def image_dims(data: bytes, fast: bool = False):
    """(w, h) of an encoded image, or None if undecodable. `fast=True`
    parses headers only (JPEG SOF / PNG IHDR) — a cheap validity+size probe
    for batch admission; falls back to the full decode when header parsing
    fails (e.g. exotic marker layouts)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if fast and lib.xfm_image_dims_fast(data, len(data), ctypes.byref(w),
                                        ctypes.byref(h)) == 0:
        return w.value, h.value
    if lib.xfm_image_dims(data, len(data), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        return None
    return w.value, h.value


# op name → code, matching loader.cpp's RandaugOp enum.
RANDAUG_OP_CODES = {
    "Identity": 0, "AutoContrast": 1, "Equalize": 2, "Brightness": 3,
    "Sharpness": 4, "ShearX": 5, "ShearY": 6, "TranslateX": 7,
    "TranslateY": 8, "Rotate": 9, "Invert": 10, "Posterize": 11,
    "Solarize": 12, "Color": 13, "Contrast": 14,
}


def randaugment_batch(images: np.ndarray, plans: list, m: float,
                      threads: int | None = None) -> bool:
    """Apply per-image RandAugment plans IN PLACE on a [B,S,S,3] uint8 batch
    via the C++ op implementations (PIL conventions; loader.cpp RandAugment
    section). `plans[i]` is RandomAugment.plan() output: [(name, sign), ...].
    Returns False (caller falls back to PIL) when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "xfm_randaugment_batch"):
        return False
    assert images.dtype == np.uint8 and images.ndim == 4
    n, s = images.shape[0], images.shape[1]
    max_ops = max([len(p) for p in plans] + [1])
    codes = np.full((n, max_ops), -1, np.int32)
    signs = np.zeros((n, max_ops), np.float32)
    for i, plan in enumerate(plans):
        for k, (name, sign) in enumerate(plan):
            codes[i, k] = RANDAUG_OP_CODES[name]
            signs[i, k] = sign
    if threads is None:
        threads = min(max(os.cpu_count() or 4, 1), 16)
    # in-place: a contiguity copy here would silently discard the results
    assert images.flags["C_CONTIGUOUS"], "randaugment_batch needs contiguous"
    lib.xfm_randaugment_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, s,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        signs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_ops, float(m), threads)
    return True


def decode_batch(blobs: list[bytes], out_size: int,
                 crops: np.ndarray | None = None,
                 hflips: np.ndarray | None = None,
                 threads: int | None = None,
                 return_status: bool = False):
    """Threaded decode+crop+resize. blobs: encoded JPEG/PNG bytes.
    crops: [B,4] int32 (x,y,w,h; w<=0 = full frame). → uint8 [B,S,S,3],
    or None when the native path is unavailable. With `return_status=True`
    returns (images, status[B] int32: 0 ok / 1 failed-and-zero-filled)."""
    lib = get_lib()
    if lib is None:
        return (None, None) if return_status else None
    n = len(blobs)
    if crops is None:
        crops = np.zeros((n, 4), np.int32)
    if hflips is None:
        hflips = np.zeros((n,), np.int32)
    crops = np.ascontiguousarray(crops, np.int32)
    hflips = np.ascontiguousarray(hflips, np.int32)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    arr_t = ctypes.c_char_p * n
    datas = arr_t(*blobs)
    lens = (ctypes.c_long * n)(*[len(b) for b in blobs])
    if threads is None:
        threads = min(max(os.cpu_count() or 4, 1), 16)
    lib.xfm_decode_batch_status(
        ctypes.cast(datas, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_long)),
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_size,
        hflips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if return_status:
        return out, status
    return out
