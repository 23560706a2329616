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
# by tests/test_device_randaug.py). Host keeps only JPEG decode + crop/resize
# (the C++ loader); the N=2 op rounds run batched under jit where they fuse
# into the input step — this removes ~190 ms/48-batch of host PIL work
# (PERF.md round-2 input-pipeline section), which matters because pod hosts
# feed many chips and the dev host here has one core.
# ---------------------------------------------------------------------------

RANDAUG_DEFAULT = ("Identity", "AutoContrast", "Equalize", "Brightness",
                   "Sharpness", "ShearX", "ShearY", "TranslateX",
                   "TranslateY", "Rotate")
_FILL = 128.0  # PIL fillcolor=(128,128,128) for geometric ops
_MAX_LEVEL = 10


def _hist256(vals):
    """[P] int32 in [0,256) → [256] counts, sort-based (TPU-friendly: no
    scatter)."""
    s = jnp.sort(vals)
    idx = jnp.searchsorted(s, jnp.arange(257))
    return jnp.diff(idx)


def _autocontrast(img):
    """Per-channel min/max stretch (PIL ImageOps.autocontrast, cutoff=0;
    lut value int-truncated as in PIL)."""
    lo = img.min(axis=(0, 1))
    hi = img.max(axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    out = jnp.clip(jnp.floor((img - lo) * scale), 0.0, 255.0)
    return jnp.where(hi > lo, out, img)


def _equalize_channel(ch_i32):
    """[P] int32 → equalized values, PIL ImageOps.equalize LUT math:
    lut[i] = (step//2 + cumsum(h)[:i]) // step, step=(total-last_nz)//255."""
    h = _hist256(ch_i32)
    nz = h > 0
    last_nz = h[255 - jnp.argmax(nz[::-1])]
    step = (ch_i32.size - last_nz) // 255
    csum = jnp.cumsum(h) - h  # exclusive prefix sum
    lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
    ident = jnp.arange(256)
    lut = jnp.where((step == 0) | (nz.sum() <= 1), ident, lut)
    return lut[ch_i32]


def _equalize(img):
    flat = img.astype(jnp.int32).reshape(-1, 3).T  # [3, P]
    out = jax.vmap(_equalize_channel)(flat)
    return out.T.reshape(img.shape).astype(jnp.float32)


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


def _geo_branch(name, m, H, W):
    """→ fn(img, sign) applying the named geometric op at magnitude m via one
    inverse-affine warp (magnitude maps per data/randaugment.py)."""
    shear = (m / _MAX_LEVEL) * 0.3
    rot = (m / _MAX_LEVEL) * 30.0

    def mat_fn(img, sign):
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        if name == "ShearX":
            mat = jnp.stack([one, sign * shear, zero, zero, one, zero])
        elif name == "ShearY":
            mat = jnp.stack([one, zero, zero, sign * shear, one, zero])
        elif name == "TranslateX":
            t = jnp.float32(int((m / _MAX_LEVEL) * (W // 3)))
            mat = jnp.stack([one, zero, sign * t, zero, one, zero])
        elif name == "TranslateY":
            t = jnp.float32(int((m / _MAX_LEVEL) * (H // 3)))
            mat = jnp.stack([one, zero, zero, zero, one, sign * t])
        elif name == "Rotate":
            # PIL Image.rotate(angle): inverse matrix built from -radians
            th = -jnp.deg2rad(sign * rot)
            a, b = jnp.cos(th), jnp.sin(th)
            cx, cy = W / 2.0, H / 2.0
            c = cx - (a * cx + b * cy)
            f = cy - (-b * cx + a * cy)
            mat = jnp.stack([a, b, c, -b, a, f])
        else:  # pragma: no cover
            raise ValueError(name)
        return _affine_sample(img, mat)

    return mat_fn


def _randaug_branches(augs, m, H, W):
    enh = (m / _MAX_LEVEL) * 1.8 + 0.1
    out = []
    for name in augs:
        if name == "Identity":
            out.append(lambda im, s: im)
        elif name == "AutoContrast":
            out.append(lambda im, s: _autocontrast(im))
        elif name == "Equalize":
            out.append(lambda im, s: _equalize(im))
        elif name == "Brightness":
            out.append(lambda im, s, f=enh: _brightness(im, f))
        elif name == "Sharpness":
            out.append(lambda im, s, f=enh: _sharpness(im, f))
        else:
            out.append(_geo_branch(name, m, H, W))
    return out


def _randaug_one(rng, img, augs, n, m):
    """f32 [H,W,3] in [0,255] → same, after N sampled op rounds (each op
    applied with prob 0.5, sign ±0.5/0.5 — data/randaugment.py plan())."""
    H, W = img.shape[0], img.shape[1]
    branches = _randaug_branches(augs, m, H, W)
    for _ in range(n):
        rng, r_op, r_skip, r_sign = jax.random.split(rng, 4)
        op = jax.random.randint(r_op, (), 0, len(augs))
        apply = jax.random.uniform(r_skip) <= 0.5
        sign = jnp.where(jax.random.uniform(r_sign) < 0.5, -1.0, 1.0)
        out = jax.lax.switch(op, branches, img, sign)
        out = jnp.round(jnp.clip(out, 0.0, 255.0))  # uint8 quantize per op
        img = jnp.where(apply, out, img)
    return img


@partial(jax.jit, static_argnames=("augs", "n", "m"))
def randaugment_batch(rng, images_u8, augs: tuple = RANDAUG_DEFAULT,
                      n: int = 2, m: int = 7):
    """uint8 [B,H,W,3] → uint8 [B,H,W,3], per-image RandAugment(N,M) on
    device (reference dataset/randaugment.py:317-346 semantics via the PIL
    contract in data/randaugment.py)."""
    imgs = images_u8.astype(jnp.float32)
    rngs = jax.random.split(rng, imgs.shape[0])
    out = jax.vmap(lambda r, im: _randaug_one(r, im, augs, n, m))(rngs, imgs)
    return out.astype(jnp.uint8)


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
