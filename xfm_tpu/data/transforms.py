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


def random_resized_crop(img: Image.Image, size: int, scale=(0.5, 1.0),
                        ratio=(3 / 4, 4 / 3),
                        rng: np.random.Generator | None = None) -> Image.Image:
    rng = rng or np.random.default_rng()
    w, h = img.size
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
            return img.resize((size, size), Image.BICUBIC,
                              box=(x, y, x + cw, y + ch))
    # fallback: center crop
    s = min(w, h)
    x, y = (w - s) // 2, (h - s) // 2
    return img.resize((size, size), Image.BICUBIC, box=(x, y, x + s, y + s))


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


class TestTransform:
    """Resize + normalize (reference dataset/__init__.py:64-68)."""

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
