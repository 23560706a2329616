"""Input-pipeline throughput: host PIL path vs native C++ loader (+ device
RandAugment).

Measures, per 48-image batch of ~500px JPEGs (the pretrain shape budget):
  1. host PIL: decode + RandomCrop/resize + RandAugment(2,7) + normalize
  2. native:   C++ threaded decode+crop+resize emitting uint8
               (RandAugment deferred to device — data/device_aug.py)
  3. device:   randaugment_batch jit walltime on the default backend
               (amortized; it runs inside the train step where it overlaps
               the model's matmuls)

Run on the dev host:  python scripts/bench_input_pipeline.py
"""
import io
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, ".")

BATCH = 48
RES = 224
SRC = 500


def make_blobs(n=BATCH, src=SRC):
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n):
        # photo-like low-frequency field so JPEG sizes are realistic
        small = rng.integers(0, 256, (src // 8, src // 8, 3), np.uint8)
        img = Image.fromarray(small).resize((src, src), Image.BICUBIC)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    return blobs


def bench(fn, iters=5, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    from xfm_tpu import native
    from xfm_tpu.data.transforms import NativeBatchTransform, TrainTransform

    blobs = make_blobs()
    dims = [(SRC, SRC)] * BATCH

    t_host = TrainTransform(RES, seed=0)

    def pil_path():
        out = np.empty((BATCH, RES, RES, 3), np.float32)
        for i, b in enumerate(blobs):
            img = Image.open(io.BytesIO(b)).convert("RGB")
            out[i] = t_host(img)
        return out

    ms_pil = bench(pil_path) * 1e3
    print(f"host PIL decode+aug+normalize: {ms_pil:8.1f} ms/batch "
          f"({BATCH / ms_pil * 1e3:7.1f} img/s)")

    if not native.available():
        print("native loader unavailable — skipping native/device paths")
        return

    t_nat = NativeBatchTransform(TrainTransform(RES, seed=0), workers=8,
                                 device_randaug=True)
    ms_nat = bench(lambda: t_nat(blobs, dims)) * 1e3
    print(f"native decode+crop+resize u8:  {ms_nat:8.1f} ms/batch "
          f"({BATCH / ms_nat * 1e3:7.1f} img/s)  [host work left on the "
          f"pipeline]")

    # host randaug on top of native decode (the pre-device_randaug split)
    t_nat_host_aug = NativeBatchTransform(TrainTransform(RES, seed=0),
                                          workers=8)
    ms_nat_aug = bench(lambda: t_nat_host_aug(blobs, dims)) * 1e3
    print(f"native decode + host randaug:  {ms_nat_aug:8.1f} ms/batch "
          f"({BATCH / ms_nat_aug * 1e3:7.1f} img/s)")

    import jax

    from xfm_tpu.data.device_aug import randaugment_batch

    u8 = t_nat(blobs, dims)
    x = jax.device_put(u8)
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(randaugment_batch(key, x))
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        out = randaugment_batch(jax.random.fold_in(key, i), x)
    float(np.asarray(out).sum())  # force fetch (tunnel-safe)
    ms_dev = (time.perf_counter() - t0) / iters * 1e3
    print(f"device randaugment_batch:      {ms_dev:8.1f} ms/batch on "
          f"{jax.default_backend()} (overlaps the train step)")


if __name__ == "__main__":
    main()
