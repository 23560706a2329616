"""RandAugment (reference dataset/randaugment.py:317-346): N ops sampled per
image, each applied with prob 0.5 at magnitude M (MAX_LEVEL=10 scale).

Implemented over PIL (ImageOps/ImageEnhance/affine transforms) instead of the
reference's hand-rolled numpy warps — same op set and magnitude mapping.
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

MAX_LEVEL = 10
REPLACE = (128, 128, 128)


def _shear_arg(level):
    return (level / MAX_LEVEL) * 0.3


def _translate_arg(level, const=250):
    return int((level / MAX_LEVEL) * const)


def _rotate_arg(level):
    return (level / MAX_LEVEL) * 30


def _enhance_arg(level):
    return (level / MAX_LEVEL) * 1.8 + 0.1


def _posterize_arg(level):
    return int((level / MAX_LEVEL) * 4)


def _solarize_arg(level):
    return int((level / MAX_LEVEL) * 256)


class RandomAugment:
    DEFAULT_AUGS = ("Identity", "AutoContrast", "Equalize", "Brightness",
                    "Sharpness", "ShearX", "ShearY", "TranslateX",
                    "TranslateY", "Rotate")

    def __init__(self, N: int = 2, M: int = 7, augs=None,
                 rng: np.random.Generator | None = None):
        self.N, self.M = N, M
        self.augs = tuple(augs) if augs else self.DEFAULT_AUGS
        self.rng = rng or np.random.default_rng()

    # --- ops ---------------------------------------------------------------

    def plan(self, rng: np.random.Generator | None = None):
        """Draw ALL randomness for one image up front → list of (name, sign)
        ops. Lets `apply_plan` run rng-free on a worker thread (the shared
        np Generator is not thread-safe; PIL ops release the GIL)."""
        r = rng or self.rng
        ops = r.choice(len(self.augs), self.N)
        planned = []
        for i in ops:
            skip = r.random() > 0.5
            sign = -1 if r.random() < 0.5 else 1
            if not skip:
                planned.append((self.augs[int(i)], sign))
        return planned

    def apply_plan(self, img, planned) -> Image.Image:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img.astype(np.uint8))
        for name, sign in planned:
            img = self._apply(img, name, sign=sign)
        return img

    def _apply(self, img: Image.Image, name: str,
               sign: int | None = None) -> Image.Image:
        r, lvl = self.rng, self.M
        if sign is None:
            sign = -1 if r.random() < 0.5 else 1
        if name == "Identity":
            return img
        if name == "AutoContrast":
            return ImageOps.autocontrast(img)
        if name == "Equalize":
            return ImageOps.equalize(img)
        if name == "Invert":
            return ImageOps.invert(img)
        if name == "Posterize":
            return ImageOps.posterize(img, max(1, 8 - _posterize_arg(lvl)))
        if name == "Solarize":
            return ImageOps.solarize(img, 256 - _solarize_arg(lvl))
        if name in ("Color", "Contrast", "Brightness", "Sharpness"):
            enh = {"Color": ImageEnhance.Color,
                   "Contrast": ImageEnhance.Contrast,
                   "Brightness": ImageEnhance.Brightness,
                   "Sharpness": ImageEnhance.Sharpness}[name]
            return enh(img).enhance(_enhance_arg(lvl))
        if name == "Rotate":
            return img.rotate(sign * _rotate_arg(lvl),
                              resample=Image.BILINEAR, fillcolor=REPLACE)
        if name == "ShearX":
            s = sign * _shear_arg(lvl)
            return img.transform(img.size, Image.AFFINE, (1, s, 0, 0, 1, 0),
                                 resample=Image.BILINEAR, fillcolor=REPLACE)
        if name == "ShearY":
            s = sign * _shear_arg(lvl)
            return img.transform(img.size, Image.AFFINE, (1, 0, 0, s, 1, 0),
                                 resample=Image.BILINEAR, fillcolor=REPLACE)
        if name == "TranslateX":
            t = sign * _translate_arg(lvl, img.size[0] // 3)
            return img.transform(img.size, Image.AFFINE, (1, 0, t, 0, 1, 0),
                                 resample=Image.BILINEAR, fillcolor=REPLACE)
        if name == "TranslateY":
            t = sign * _translate_arg(lvl, img.size[1] // 3)
            return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, t),
                                 resample=Image.BILINEAR, fillcolor=REPLACE)
        raise ValueError(name)

    def __call__(self, img):
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img.astype(np.uint8))
        ops = self.rng.choice(len(self.augs), self.N)
        for i in ops:
            if self.rng.random() > 0.5:
                continue
            img = self._apply(img, self.augs[int(i)])
        return img
