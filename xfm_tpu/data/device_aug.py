"""On-device (XLA) image preprocessing.

The reference does all augmentation in PIL inside DataLoader workers
(reference dataset/__init__.py:28-68); the BASELINE north star asks for
decode+augment+patchify fused on-device. Split of labor here:
host (C++ loader) decodes to uint8, the TPU does random-resized-crop +
hflip + CLIP normalization inside the jitted input step — per-sample
randomness from the jax PRNG, fully fused by XLA into the first conv/matmul.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .transforms import CLIP_MEAN, CLIP_STD


def _one_crop(rng, img, out_size, scale, ratio):
    """Random-resized-crop via scale_and_translate (bilinear), traced crop
    params — shapes stay static."""
    H, W = img.shape[0], img.shape[1]
    r_area, r_ratio, r_x, r_y, r_flip = jax.random.split(rng, 5)
    area = H * W * jax.random.uniform(r_area, (), minval=scale[0],
                                      maxval=scale[1])
    log_r = jax.random.uniform(r_ratio, (), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    ar = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ar), 8.0, W)
    ch = jnp.clip(jnp.sqrt(area / ar), 8.0, H)
    x0 = jax.random.uniform(r_x, (), minval=0.0, maxval=1.0) * (W - cw)
    y0 = jax.random.uniform(r_y, (), minval=0.0, maxval=1.0) * (H - ch)

    # map crop box [y0, y0+ch) × [x0, x0+cw) to the out_size grid
    sy = out_size / ch
    sx = out_size / cw
    out = jax.image.scale_and_translate(
        img.astype(jnp.float32), (out_size, out_size, 3), (0, 1),
        jnp.stack([sy, sx]), jnp.stack([-y0 * sy, -x0 * sx]),
        method="bilinear", antialias=True)
    flip = jax.random.bernoulli(r_flip)
    out = jnp.where(flip, out[:, ::-1, :], out)
    return out


def maybe_normalize(images):
    """uint8 images → CLIP-normalized float32 ON DEVICE; float input passes
    through unchanged. Streams emit uint8 when the native loader is active:
    host-side normalize cost (~0.9 ms/image on one core) disappears and the
    host→device transfer shrinks 4x. Trace-safe (dtype is static)."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        x = images.astype(jnp.float32) / 255.0
        return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return images


# ---------------------------------------------------------------------------
# On-device RandAugment (matches data/randaugment.py's PIL semantics; pinned
# by tests/test_device_randaug.py). OPT-IN (`device_randaug: true` on a
# stream with the native loader): host keeps only JPEG decode + crop/resize
# and the N=2 op rounds run batched under jit.
#
# Measured tradeoff (PERF.md round-2 input-pipeline section): this costs
# ~137 ms/48-batch of SERIAL device time inside the train step (was 1064 ms
# as a naive per-image vmap(lax.switch)), while host RandAugment costs
# ~56 ms/48-batch of thread-pool time that the prefetcher overlaps with the
# step — so the device path only wins on host-starved pods (many chips per
# host core). Kernel-shape notes: each round computes
# every photometric op once batch-wide and selects per image; geometric ops
# use batch-SHARED warp matrices (XLA lowers batch-identical gather indices
# ~15x faster than per-image ones) with negative signs realized by flip
# conjugation; the Equalize histogram/LUT is one-hot compare + exact bf16
# matmul (vmapped 50k-element sorts were the dominant cost of the naive
# version).
# ---------------------------------------------------------------------------

RANDAUG_DEFAULT = ("Identity", "AutoContrast", "Equalize", "Brightness",
                   "Sharpness", "ShearX", "ShearY", "TranslateX",
                   "TranslateY", "Rotate")
_GEO_OPS = ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")
_FILL = 128.0  # PIL fillcolor=(128,128,128) for geometric ops
_MAX_LEVEL = 10


def _autocontrast(img):
    """Per-channel min/max stretch (PIL ImageOps.autocontrast, cutoff=0;
    lut value int-truncated as in PIL)."""
    lo = img.min(axis=(0, 1))
    hi = img.max(axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    out = jnp.clip(jnp.floor((img - lo) * scale), 0.0, 255.0)
    return jnp.where(hi > lo, out, img)


def _equalize(img):
    """PIL ImageOps.equalize LUT math per channel:
    lut[i] = (step//2 + cumsum(h)[:i]) // step, step=(total-last_nz)//255.

    One-hot formulation throughout: the [P,256] compare feeds both the
    histogram reduce and (as an exact bf16 matmul — one-hots and ints <256
    are bf16-exact) the LUT application, so no gather/scatter/sort appears.
    """
    P = img.shape[0] * img.shape[1]
    flat = img.astype(jnp.int32).reshape(P, 3)
    oh = flat[:, :, None] == jnp.arange(256, dtype=jnp.int32)  # [P,3,256]
    h = oh.sum(0)                                              # [3,256]
    nz = h > 0
    last_nz = jnp.take_along_axis(
        h, 255 - jnp.argmax(nz[:, ::-1], axis=1)[:, None], axis=1)[:, 0]
    step = (P - last_nz) // 255                                # [3]
    csum = jnp.cumsum(h, axis=1) - h  # exclusive prefix sum
    lut = jnp.clip((step[:, None] // 2 + csum)
                   // jnp.maximum(step[:, None], 1), 0, 255)
    ident = jnp.arange(256)[None, :]
    degenerate = (step == 0) | (nz.sum(axis=1) <= 1)
    lut = jnp.where(degenerate[:, None], ident, lut)
    out = jnp.einsum("pck,ck->pc", oh.astype(jnp.bfloat16),
                     lut.astype(jnp.bfloat16))
    return out.reshape(img.shape).astype(jnp.float32)


def _brightness(img, factor):
    """ImageEnhance.Brightness: blend toward black."""
    return jnp.clip(img * factor, 0.0, 255.0)


def _sharpness(img, factor):
    """ImageEnhance.Sharpness: blend img with its SMOOTH-filtered version
    (3x3 [[1,1,1],[1,5,1],[1,1,1]]/13); PIL leaves the 1-px border
    unfiltered."""
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    acc = 5.0 * img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + p[1 + dy:img.shape[0] + 1 + dy,
                          1 + dx:img.shape[1] + 1 + dx]
    smooth = jnp.round(acc / 13.0)
    # border rows/cols keep the original pixels (PIL 3x3 filter semantics)
    S0, S1 = img.shape[0], img.shape[1]
    yy = jnp.arange(S0)[:, None, None]
    xx = jnp.arange(S1)[None, :, None]
    interior = ((yy > 0) & (yy < S0 - 1) & (xx > 0) & (xx < S1 - 1))
    smooth = jnp.where(interior, smooth, img)
    return jnp.clip(smooth + factor * (img - smooth), 0.0, 255.0)


def _affine_sample(img, mat):
    """Inverse-affine bilinear warp with PIL conventions: output pixel (x,y)
    samples input at (a(x+.5)+b(y+.5)+c-.5, d(x+.5)+e(y+.5)+f-.5); positions
    outside [0,W)x[0,H) (pre -0.5 space) take the gray fill. Neighbor taps
    clamp at the border (PIL bilinear_filter)."""
    H, W = img.shape[0], img.shape[1]
    y, x = jnp.mgrid[0:H, 0:W]
    xc = mat[0] * (x + 0.5) + mat[1] * (y + 0.5) + mat[2]
    yc = mat[3] * (x + 0.5) + mat[4] * (y + 0.5) + mat[5]
    valid = (xc >= 0) & (xc < W) & (yc >= 0) & (yc < H)
    xs, ys = xc - 0.5, yc - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    def tap(yi, xi):
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return img[yi, xi]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return jnp.where(valid[..., None], out, _FILL)


def _geo_mat(name, m, H, W, sign):
    """Inverse-affine 6-vector for the named geometric op at magnitude m
    (magnitude maps per data/randaugment.py). `sign` may be a scalar or a
    [B] array — the matrix broadcasts to [..., 6]."""
    shear = (m / _MAX_LEVEL) * 0.3
    rot = (m / _MAX_LEVEL) * 30.0
    one = jnp.ones_like(sign)
    zero = jnp.zeros_like(sign)
    if name == "ShearX":
        mat = [one, sign * shear, zero, zero, one, zero]
    elif name == "ShearY":
        mat = [one, zero, zero, sign * shear, one, zero]
    elif name == "TranslateX":
        t = float(int((m / _MAX_LEVEL) * (W // 3)))
        mat = [one, zero, sign * t, zero, one, zero]
    elif name == "TranslateY":
        t = float(int((m / _MAX_LEVEL) * (H // 3)))
        mat = [one, zero, zero, zero, one, sign * t]
    elif name == "Rotate":
        # PIL Image.rotate(angle): inverse matrix built from -radians
        th = -jnp.deg2rad(sign * rot)
        a, b = jnp.cos(th), jnp.sin(th)
        cx, cy = W / 2.0, H / 2.0
        c = cx - (a * cx + b * cy)
        f = cy - (-b * cx + a * cy)
        mat = [a, b, c, -b, a, f]
    else:  # pragma: no cover
        raise ValueError(name)
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in mat], -1)


def _geo_branch(name, m, H, W):
    """→ fn(img, sign) applying the named geometric op via one warp (the
    single-image form; the batch path goes through _randaug_round)."""
    return lambda img, sign: _affine_sample(img, _geo_mat(name, m, H, W,
                                                          jnp.float32(sign)))


def _randaug_round(rng, imgs, augs, m):
    """One RandAugment round on the whole batch: per-image op draw (uniform
    over `augs`), applied with prob 0.5, sign ±0.5/0.5 — the plan() contract
    of data/randaugment.py.

    Every op runs once batch-wide and is selected per image. Geometric ops
    each use ONE warp with a batch-SHARED (+sign) matrix — XLA lowers a
    gather with batch-identical indices ~15x faster than one with per-image
    indices (5.8 vs 85 ms/48-batch measured) — and realize the negative
    sign by flip conjugation: warp(-s) = flip . warp(+s) . flip, exact for
    PIL's pixel-center/fill/border conventions (pinned by
    tests/test_device_randaug.py::test_negative_sign_flip_conjugation)."""
    B, H, W = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    r_op, r_skip, r_sign = jax.random.split(rng, 3)
    op = jax.random.randint(r_op, (B,), 0, len(augs))
    applied = jax.random.uniform(r_skip, (B,)) <= 0.5
    neg = jax.random.uniform(r_sign, (B,)) < 0.5
    enh = (m / _MAX_LEVEL) * 1.8 + 0.1

    def sel(k):
        return (applied & (op == k))[:, None, None, None]

    out = imgs
    for k, name in enumerate(augs):
        if name == "Identity":
            continue
        elif name == "AutoContrast":
            out = jnp.where(sel(k), jax.vmap(_autocontrast)(imgs), out)
        elif name == "Equalize":
            out = jnp.where(sel(k), jax.vmap(_equalize)(imgs), out)
        elif name == "Brightness":
            out = jnp.where(sel(k), _brightness(imgs, enh), out)
        elif name == "Sharpness":
            out = jnp.where(sel(k), jax.vmap(
                lambda im: _sharpness(im, enh))(imgs), out)
        elif name in _GEO_OPS:
            # flip axis: x-reflection for x-shift ops and rotation,
            # y-reflection for y-shift ops
            ax = 1 if name in ("ShearY", "TranslateY") else 2
            flip = neg[:, None, None, None]
            inp = jnp.where(flip, jnp.flip(imgs, axis=ax), imgs)
            mat = _geo_mat(name, m, H, W, jnp.float32(1.0))
            warped = jax.vmap(_affine_sample, in_axes=(0, None))(inp, mat)
            warped = jnp.where(flip, jnp.flip(warped, axis=ax), warped)
            out = jnp.where(sel(k), warped, out)
        else:  # pragma: no cover
            raise ValueError(name)
    # uint8 quantize per applied op (unselected rows are already integral)
    return jnp.round(jnp.clip(out, 0.0, 255.0))


@partial(jax.jit, static_argnames=("augs", "n", "m"))
def randaugment_batch(rng, images_u8, augs: tuple = RANDAUG_DEFAULT,
                      n: int = 2, m: int = 7):
    """uint8 [B,H,W,3] → uint8 [B,H,W,3], per-image RandAugment(N,M) on
    device (reference dataset/randaugment.py:317-346 semantics via the PIL
    contract in data/randaugment.py)."""
    imgs = images_u8.astype(jnp.float32)
    for i in range(n):
        imgs = _randaug_round(jax.random.fold_in(rng, i), imgs, augs, m)
    return imgs.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("out_size", "scale", "ratio", "train"))
def augment_batch(rng, images_u8, out_size: int = 224,
                  scale: tuple = (0.5, 1.0), ratio: tuple = (0.75, 4 / 3),
                  train: bool = True):
    """uint8 [B, H, W, 3] → CLIP-normalized float32 [B, out, out, 3]."""
    imgs = images_u8.astype(jnp.float32) / 255.0
    if train:
        rngs = jax.random.split(rng, imgs.shape[0])
        out = jax.vmap(lambda r, im: _one_crop(r, im, out_size, scale,
                                               ratio))(rngs, imgs)
    else:
        B, H, W, _ = imgs.shape
        out = jax.image.resize(imgs, (B, out_size, out_size, 3),
                               method="bilinear")
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (out - mean) / std
