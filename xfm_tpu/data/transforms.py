"""Host-side image transforms producing NHWC float32 arrays
(reference dataset/__init__.py:26-68 transform stacks).

CLIP normalization constants (reference dataset/__init__.py:26). Output is
NHWC (TPU-native) instead of torch NCHW.
"""
from __future__ import annotations

import base64
import io

import numpy as np
from PIL import Image

from .randaugment import RandomAugment

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

Image.MAX_IMAGE_PIXELS = None  # tolerate huge inputs
try:  # tolerate truncated JPEGs (reference dataset/pretrain_dataset.py:28-29)
    from PIL import ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
except Exception:
    pass


def decode_image(source) -> Image.Image:
    """Path / bytes / base64 string / uint8 array → RGB PIL image
    (reference dataset/pretrain_dataset.py:239-246)."""
    if isinstance(source, np.ndarray):
        if source.ndim == 2:
            source = np.stack([source] * 3, axis=-1)
        return Image.fromarray(source.astype(np.uint8)).convert("RGB")
    if isinstance(source, Image.Image):
        img = source
    elif isinstance(source, (bytes, bytearray)):
        img = Image.open(io.BytesIO(source))
    elif isinstance(source, str) and len(source) > 260:
        img = Image.open(io.BytesIO(base64.b64decode(source)))
    else:
        img = Image.open(source)
    return img.convert("RGB")


def normalize(arr: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] → CLIP-normalized float32."""
    return (arr.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD


def crop_box(w: int, h: int, scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3),
             rng: np.random.Generator | None = None):
    """(x, y, cw, ch) with the RandomResizedCrop distribution; center-crop
    fallback after 10 rejected draws (torchvision semantics)."""
    rng = rng or np.random.default_rng()
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = float(np.exp(log_r))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = int(rng.integers(0, w - cw, endpoint=True))
            y = int(rng.integers(0, h - ch, endpoint=True))
            return x, y, cw, ch
    s = min(w, h)
    return (w - s) // 2, (h - s) // 2, s, s


def random_resized_crop(img: Image.Image, size: int, scale=(0.5, 1.0),
                        ratio=(3 / 4, 4 / 3),
                        rng: np.random.Generator | None = None) -> Image.Image:
    w, h = img.size
    x, y, cw, ch = crop_box(w, h, scale, ratio, rng)
    return img.resize((size, size), Image.BICUBIC,
                      box=(x, y, x + cw, y + ch))


class TrainTransform:
    """RandomResizedCrop + hflip + RandAugment(2,7) + normalize
    (reference dataset/__init__.py:38-46)."""

    def __init__(self, image_res: int, scale=(0.5, 1.0), hflip=True,
                 randaug=True,
                 augs=("Identity", "AutoContrast", "Equalize", "Brightness",
                       "Sharpness", "ShearX", "ShearY", "TranslateX",
                       "TranslateY", "Rotate"),
                 seed: int | None = None):
        self.image_res = image_res
        self.scale = scale
        self.hflip = hflip
        self.rng = np.random.default_rng(seed)
        self.randaug = RandomAugment(2, 7, augs=augs,
                                     rng=self.rng) if randaug else None

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = random_resized_crop(img, self.image_res, self.scale,
                                  rng=self.rng)
        if self.hflip and self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.randaug is not None:
            img = self.randaug(img)
        return normalize(np.asarray(img, np.uint8))


class NativeBatchTransform:
    """TrainTransform over raw encoded blobs via the C++ loader
    (xfm_tpu/native/loader.cpp): threaded decode + crop + hflip in native
    code, RandAugment pre-planned on the admission thread and applied by a
    GIL-releasing PIL thread pool, then CLIP normalize. Replaces the
    reference's DataLoader-worker PIL pipeline
    (reference dataset/__init__.py:221-246) with host-thread parallelism.

    Equivalent to the PIL TrainTransform up to the resize filter (native
    bilinear vs PIL bicubic) — pinned by tests/test_data.py."""

    def __init__(self, train_transform: "TrainTransform", workers: int = 8,
                 emit_uint8: bool = True, device_randaug: bool = False):
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        self.native = native
        self.image_res = train_transform.image_res
        self.scale = train_transform.scale
        self.hflip = train_transform.hflip
        self.randaug = train_transform.randaug
        self.rng = train_transform.rng
        self.workers = max(1, workers)
        self.pool = ThreadPoolExecutor(self.workers)
        # uint8 batches: CLIP-normalize runs on device
        # (models get_vision_embeds → device_aug.maybe_normalize) — saves
        # host float math and 4x of host→device transfer.
        self.emit_uint8 = emit_uint8
        # device_randaug: emit un-augmented uint8; the train step applies
        # data/device_aug.randaugment_batch under jit (host keeps only
        # decode+crop+resize — the 1-core-host bottleneck fix, PERF.md).
        self.device_randaug = device_randaug and train_transform.randaug \
            is not None

    @classmethod
    def maybe_build(cls, train_transform, workers: int,
                    device_randaug: bool = False):
        """→ instance, or None when the native loader is unavailable or
        disabled (XFM_NATIVE_LOADER=0) or workers <= 0."""
        import os

        from .. import native

        if workers <= 0 or os.environ.get("XFM_NATIVE_LOADER", "1") == "0":
            return None
        if not native.available():
            return None
        return cls(train_transform, workers, device_randaug=device_randaug)

    def probe(self, blob: bytes):
        """(w, h) via header parse, or None for undecodable data — the
        broken-sample skip happens at admission time."""
        return self.native.image_dims(blob, fast=True)

    def __call__(self, blobs: list, dims: list, return_submap: bool = False):
        """Decode+augment a batch; None when every blob is broken.

        With `return_submap=True` returns (images, sub) where sub[i] is the
        slot whose pixels slot i holds — sub[i] != i marks a slot whose full
        decode failed (possible even after the admission-time header probe,
        e.g. a truncated JPEG body) and was substituted by a good in-batch
        image. Paired callers MUST substitute the companion modality with
        sub as well (caps[sub[i]]), otherwise the broken sample's caption
        would sit on another image's pixels — a mismatched pair that poisons
        ITC/ITM/captioning losses (the reference pipeline drops broken
        samples entirely, dataset/pretrain_dataset.py skip-on-exception)."""
        n = len(blobs)
        crops = np.asarray(
            [crop_box(w, h, self.scale, rng=self.rng) for w, h in dims],
            np.int32)
        hflips = ((self.rng.random(n) < 0.5).astype(np.int32)
                  if self.hflip else np.zeros((n,), np.int32))
        u8, status = self.native.decode_batch(
            blobs, self.image_res, crops, hflips, threads=self.workers,
            return_status=True)
        good = np.flatnonzero(status == 0)
        if good.size == 0:
            return (None, None) if return_submap else None
        sub = np.arange(n)
        for j, i in enumerate(np.flatnonzero(status != 0)):
            sub[i] = good[j % good.size]
            u8[i] = u8[sub[i]]  # substitute, keep batch static
        out = self._augment(u8, n)
        return (out, sub) if return_submap else out

    def _augment(self, u8, n):
        if self.randaug is None or self.device_randaug:
            return u8 if self.emit_uint8 else normalize(u8)
        plans = [self.randaug.plan(self.rng) for _ in range(n)]
        import os

        if (os.environ.get("XFM_NATIVE_RANDAUG", "1") != "0"
                and self.native.randaugment_batch(u8, plans, self.randaug.M,
                                                  threads=self.workers)):
            # C++ op implementations (loader.cpp RandAugment section),
            # in-place on the decoded batch — PIL pool only as fallback.
            return u8 if self.emit_uint8 else normalize(u8)

        def one(i):
            img = np.asarray(self.randaug.apply_plan(u8[i], plans[i]),
                             np.uint8)
            return img if self.emit_uint8 else normalize(img)

        return np.stack(list(self.pool.map(one, range(n))))


class TestTransform:
    """Resize + normalize (reference dataset/__init__.py:64-68)."""

    __test__ = False  # not a pytest class (silences collection warning)

    def __init__(self, image_res: int):
        self.image_res = image_res

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.image_res, self.image_res), Image.BICUBIC)
        return normalize(np.asarray(img, np.uint8))


def build_transforms(config: dict):
    res = config.get("image_res", 224)
    return {
        "pretrain": TrainTransform(res, scale=(0.2, 1.0)),
        "train": TrainTransform(res, scale=(0.5, 1.0)),
        "train_wohflip": TrainTransform(res, scale=(0.5, 1.0), hflip=False),
        "box": TrainTransform(res, randaug=True, hflip=False,
                              augs=("Identity", "AutoContrast", "Equalize",
                                    "Brightness", "Sharpness")),
        "test": TestTransform(res),
    }
