"""Focused trace of the BEiT-2 vision pair pass (full+masked 2B rows,
fwd+bwd) — the ~54% cost pool of the pretrain step. Reuses profile_step's
xplane parser."""
import glob
import os
import shutil
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from profile_step import op_totals  # noqa: E402


def main():
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    logdir = "/tmp/xfm_profile_vision"
    shutil.rmtree(logdir, ignore_errors=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    from __graft_entry__ import _xfm_config
    from xfm_tpu.models.beit2 import BeitVisionTransformer

    B = int(os.environ.get("XFM_BENCH_BATCH", "48"))
    cfg = _xfm_config(dtype=jnp.bfloat16).vision
    model = BeitVisionTransformer(cfg)
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, cfg.image_res, cfg.image_res, 3),
                         jnp.float32)
    mask = np.zeros((B, cfg.num_patches), bool)
    mask[:, : cfg.num_patches // 3] = True
    mask = jnp.asarray(mask)
    params = model.init(jax.random.PRNGKey(0), images)

    def loss(params, images, mask):
        full, masked = model.apply(params, images, mask,
                                   method=BeitVisionTransformer.pair)
        t = jax.lax.stop_gradient(full)
        return (jnp.mean((masked.astype(jnp.float32)
                          - t.astype(jnp.float32)) ** 2)
                + jnp.mean(full.astype(jnp.float32) ** 2))

    iters = 6

    @partial(jax.jit, donate_argnums=(0,))
    def run(params, images, mask):
        def body(c, _):
            p, acc = c
            l, g = jax.value_and_grad(loss)(p, images, mask)
            p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype),
                             p, g)
            return (p, acc + l), l

        (p, _), ls = jax.lax.scan(body, (params, 0.0), jnp.arange(iters))
        return p, ls[-1]

    params, l = run(params, images, mask)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(l)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    params, l = run(params, images, mask)
    _ = float(l)
    dt = (time.perf_counter() - t0 - rtt) / iters
    print(f"# vision pair fwd+bwd: {dt * 1e3:.2f} ms/iter (B={B}, "
          f"2B rows)", flush=True)

    jax.profiler.start_trace(logdir)
    params, l = run(params, images, mask)
    _ = float(l)
    jax.profiler.stop_trace()

    path = max(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True),
               key=os.path.getmtime)
    totals, counts, planes, by_line = op_totals(path)
    for ln, ps in sorted(by_line.items(), key=lambda kv: -kv[1]):
        print(f"# line {ln!r}: {ps / 1e9:.3f} ms total")
    total_ps = sum(totals.values())
    print(f"# leaf-op time: {total_ps / 1e9:.3f} ms over {iters} iters")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  "
              f"×{counts[name]:<6d} {name[:120]}")


if __name__ == "__main__":
    main()
