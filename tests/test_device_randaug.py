"""On-device RandAugment (data/device_aug.py) vs the host PIL contract
(data/randaugment.py — itself pinned against reference
dataset/randaugment.py:317-346 semantics).

Every op is checked against PIL at uint8 tolerance; the geometric ops pin
PIL's affine conventions (pixel-center offsets, gray fill, border clamp)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from PIL import Image, ImageEnhance, ImageOps  # noqa: E402

from xfm_tpu.data import device_aug as da  # noqa: E402
from xfm_tpu.data.randaugment import RandomAugment, _enhance_arg  # noqa: E402


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (64, 64, 3), np.uint8).astype(np.float32)
    # smooth it into a photo-like gradient field (warp tests interpolate)
    k = np.ones((7, 7), np.float32) / 49.0
    out = np.stack([_conv2(base[..., c], k) for c in range(3)], -1)
    return out.astype(np.uint8)


def _conv2(a, k):
    from numpy.lib.stride_tricks import sliding_window_view

    pad = k.shape[0] // 2
    ap = np.pad(a, pad, mode="edge")
    win = sliding_window_view(ap, k.shape)
    return (win * k).sum((-1, -2))


def _diff(dev, pil):
    return np.abs(np.asarray(dev, np.float32) - np.asarray(pil, np.float32))


def test_autocontrast_matches_pil(img):
    d = _diff(da._autocontrast(jnp.asarray(img, jnp.float32)),
              ImageOps.autocontrast(Image.fromarray(img)))
    assert d.max() <= 1.0


def test_equalize_matches_pil(img):
    d = _diff(da._equalize(jnp.asarray(img, jnp.float32)),
              ImageOps.equalize(Image.fromarray(img)))
    assert d.max() <= 1.0


@pytest.mark.parametrize("name,enh", [
    ("Brightness", ImageEnhance.Brightness),
    ("Sharpness", ImageEnhance.Sharpness)])
def test_enhance_matches_pil(img, name, enh):
    f = _enhance_arg(7)
    fn = {"Brightness": da._brightness, "Sharpness": da._sharpness}[name]
    dev = jnp.round(fn(jnp.asarray(img, jnp.float32), f))
    d = _diff(dev, enh(Image.fromarray(img)).enhance(f))
    assert d.max() <= 1.5


@pytest.mark.parametrize("name", ["ShearX", "ShearY", "TranslateX",
                                  "TranslateY", "Rotate"])
@pytest.mark.parametrize("sign", [-1, 1])
def test_geometric_matches_pil(img, name, sign):
    ra = RandomAugment(2, 7)
    fn = da._geo_branch(name, 7, 64, 64)
    dev = jnp.round(fn(jnp.asarray(img, jnp.float32), jnp.float32(sign)))
    pil = ra._apply(Image.fromarray(img), name, sign=sign)
    d = _diff(dev, pil)
    assert d.max() <= 2.0, f"{name} sign={sign}: max diff {d.max()}"
    # translations are integer shifts — bit-exact
    if name.startswith("Translate"):
        assert d.max() == 0.0


@pytest.mark.parametrize("name", ["ShearX", "ShearY", "TranslateX",
                                  "TranslateY", "Rotate"])
def test_negative_sign_flip_conjugation(img, name):
    """The batch path realizes warp(-s) as flip . warp(+s) . flip (shared
    warp matrix across the batch → fast gather); exact for PIL's
    pixel-center / fill / border-clamp conventions."""
    ax = 0 if name in ("ShearY", "TranslateY") else 1
    im = jnp.asarray(img, jnp.float32)
    direct = da._geo_branch(name, 7, 64, 64)(im, jnp.float32(-1.0))
    conj = jnp.flip(da._geo_branch(name, 7, 64, 64)(jnp.flip(im, ax),
                                                    jnp.float32(1.0)), ax)
    assert np.abs(np.asarray(direct) - np.asarray(conj)).max() <= 1e-3


@pytest.mark.slow
def test_randaugment_batch_identity_and_determinism(img):
    batch = jnp.asarray(np.stack([img] * 3))
    ident = da.randaugment_batch(jax.random.PRNGKey(0), batch,
                                 augs=("Identity",))
    assert (np.asarray(ident) == np.stack([img] * 3)).all()
    a = da.randaugment_batch(jax.random.PRNGKey(1), batch)
    b = da.randaugment_batch(jax.random.PRNGKey(1), batch)
    assert a.dtype == jnp.uint8 and a.shape == batch.shape
    assert (np.asarray(a) == np.asarray(b)).all()
    # per-image independent randomness: some pair in a 16-batch differs
    big = jnp.asarray(np.stack([img] * 16))
    c = np.asarray(da.randaugment_batch(jax.random.PRNGKey(2), big))
    assert any(not (c[i] == c[i + 1]).all() for i in range(15))


def test_randaugment_apply_rate():
    """Each round applies with prob 0.5 (plan() semantics): over many keys a
    single-op (Rotate-only) augment must leave ~25% of images unchanged
    (both rounds skipped)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    batch = jnp.asarray(np.stack([img] * 256))
    out = np.asarray(da.randaugment_batch(jax.random.PRNGKey(4), batch,
                                          augs=("Rotate",)))
    unchanged = (out == img).all(axis=(1, 2, 3)).mean()
    assert 0.12 < unchanged < 0.42  # binomial(256, .25) well within


def test_native_transform_device_mode_skips_host_randaug(tmp_path):
    """device_randaug=True → NativeBatchTransform emits the same uint8 as a
    randaug-free host transform (aug deferred to device)."""
    from xfm_tpu import native
    from xfm_tpu.data.transforms import NativeBatchTransform, TrainTransform

    if not native.available():
        pytest.skip("native loader unavailable")
    import io

    rng = np.random.default_rng(5)
    blobs = []
    for _ in range(4):
        arr = rng.integers(0, 256, (96, 80, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        blobs.append(buf.getvalue())
    dims = [(80, 96)] * 4

    t_dev = NativeBatchTransform(TrainTransform(48, seed=0), workers=2,
                                 device_randaug=True)
    t_off = NativeBatchTransform(TrainTransform(48, randaug=False, seed=0),
                                 workers=2)
    assert t_dev.device_randaug
    a = t_dev(blobs, dims)
    b = t_off(blobs, dims)
    assert a.dtype == np.uint8 and a.shape == b.shape


def test_pretrain_stream_flags_device_randaug(tmp_path):
    """ImageTextStream exposes device_randaug_active; `device_randaug: false`
    opts out (host PIL randaug as before)."""
    import base64
    import io
    import json

    from xfm_tpu import native
    from xfm_tpu.data.pretrain_data import ImageTextStream
    from xfm_tpu.data.transforms import TrainTransform
    from xfm_tpu.data.tokenization import SimpleTokenizer

    if not native.available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(6)
    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for _ in range(8):
            arr = rng.integers(0, 256, (64, 64, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            f.write(json.dumps({
                "binary": base64.b64encode(buf.getvalue()).decode(),
                "desc": "a tiny test image"}) + "\n")
    cfg = dict(images={"batch_size": 4, "num_workers": 2,
                       "device_randaug": True},
               image_res=32, patch_size=16, max_words=10, max_tokens=12,
               max_masks=3, mask_prob=0.5, skipgram_prb=0.2, skipgram_size=3,
               mask_whole_word=False, num_masking_patches=2,
               min_num_patches=1)
    tok = SimpleTokenizer.from_texts(["a tiny test image"])
    on = ImageTextStream([str(path)], cfg, tok, TrainTransform(32), 0, 1)
    assert on.device_randaug_active
    batch = next(iter(on))
    assert batch["images"].dtype == np.uint8

    # default: host randaug (device aug costs serial step time — PERF.md)
    cfg_off = dict(images={"batch_size": 4, "num_workers": 2},
                   image_res=32, patch_size=16)
    off = ImageTextStream([str(path)], cfg_off, tok, TrainTransform(32), 0, 1)
    assert not off.device_randaug_active
