"""C++ RandAugment (native/loader.cpp) vs the host PIL contract
(data/randaugment.py — itself pinned against reference
dataset/randaugment.py:317-346 semantics). Same tolerances as the device
implementation's suite (tests/test_device_randaug.py)."""
import numpy as np
import pytest
from PIL import Image

from xfm_tpu import native
from xfm_tpu.data.randaugment import RandomAugment

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader unavailable")


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (64, 64, 3), np.uint8).astype(np.float32)
    k = np.ones((7, 7), np.float32) / 49.0
    out = np.stack([_conv2(base[..., c], k) for c in range(3)], -1)
    return out.astype(np.uint8)


def _conv2(a, k):
    from numpy.lib.stride_tricks import sliding_window_view

    pad = k.shape[0] // 2
    ap = np.pad(a, pad, mode="edge")
    win = sliding_window_view(ap, k.shape)
    return (win * k).sum((-1, -2))


def _native_one(img, name, sign=1, m=7):
    batch = img[None].copy()
    ok = native.randaugment_batch(batch, [[(name, sign)]], m, threads=1)
    assert ok
    return batch[0]


def _pil_one(img, name, sign=1, m=7):
    ra = RandomAugment(2, m)
    return np.asarray(ra._apply(Image.fromarray(img), name, sign=sign),
                      np.uint8)


PHOTOMETRIC = ["AutoContrast", "Equalize", "Invert", "Posterize", "Solarize",
               "Brightness", "Color", "Contrast"]


@pytest.mark.parametrize("name", PHOTOMETRIC)
def test_photometric_matches_pil(img, name):
    d = np.abs(_native_one(img, name).astype(np.float32)
               - _pil_one(img, name).astype(np.float32))
    assert d.max() <= 1.0, f"{name}: max diff {d.max()}"


def test_sharpness_matches_pil(img):
    d = np.abs(_native_one(img, "Sharpness").astype(np.float32)
               - _pil_one(img, "Sharpness").astype(np.float32))
    assert d.max() <= 1.5, f"Sharpness: max diff {d.max()}"


@pytest.mark.parametrize("name", ["ShearX", "ShearY", "TranslateX",
                                  "TranslateY", "Rotate"])
@pytest.mark.parametrize("sign", [-1, 1])
def test_geometric_matches_pil(img, name, sign):
    nat = _native_one(img, name, sign=sign).astype(np.float32)
    pil = _pil_one(img, name, sign=sign).astype(np.float32)
    d = np.abs(nat - pil)
    assert d.max() <= 2.0, f"{name} sign={sign}: max diff {d.max()}"
    if name.startswith("Translate"):  # integer shifts are bit-exact
        assert d.max() == 0.0


def test_plan_sequence_matches_pil(img):
    """Full 2-op plans through the batch entry point vs PIL apply_plan;
    per-op <=1 rounding differences may compound across the sequence."""
    ra = RandomAugment(2, 7)
    rng = np.random.default_rng(3)
    plans = [ra.plan(rng) for _ in range(8)]
    batch = np.stack([img] * 8)
    assert native.randaugment_batch(batch, plans, 7)
    for i, plan in enumerate(plans):
        pil = np.asarray(ra.apply_plan(img, plan), np.uint8).astype(np.float32)
        d = np.abs(batch[i].astype(np.float32) - pil)
        # per-op rounding diffs of <=1 compound through value-dependent ops
        # (a 1-level histogram shift moves the whole equalize LUT by 1), so
        # the sequence bound is looser than the per-op ones
        assert d.max() <= 4.0, f"plan {plan}: max diff {d.max()}"
        assert d.mean() <= 1.0, f"plan {plan}: mean diff {d.mean()}"


def test_identity_plan_is_noop(img):
    batch = img[None].copy()
    assert native.randaugment_batch(batch, [[("Identity", 1)]], 7)
    np.testing.assert_array_equal(batch[0], img)


def test_empty_plan_is_noop(img):
    batch = img[None].copy()
    assert native.randaugment_batch(batch, [[]], 7)
    np.testing.assert_array_equal(batch[0], img)
