"""Capture a jax.profiler trace of a fine-tune-shape train step and print
per-op device time totals (the 384px retrieval and 480px VQA steps that
scripts/bench_finetune.py measures — reference configs/xfm-ft/VQA.yaml,
Retrieval_coco.yaml). Reuses profile_step.py's xplane parser.

Usage: python scripts/profile_finetune.py [vqa_train|retrieval_train]
       [--top 40] [--fresh]
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
os.environ.setdefault("XFM_BENCH_ACT", "gelu")

from profile_step import interval_union, op_totals  # noqa: E402


def capture(mode: str, logdir: str) -> None:
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench_finetune import _xfm_config
    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.schedules import linear_warmup_decay
    from xfm_tpu.train.train_state import TrainState

    r = np.random.RandomState(0)
    if mode == "vqa_train":
        from xfm_tpu.models.generation import XFMForVQA

        B, T, A = int(os.environ.get("XFM_FT_BATCH", "24")), 40, 8
        cfg = _xfm_config(image_res=480)
        model = XFMForVQA(cfg)
        res = cfg.vision.image_res
        images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
        q_ids = jnp.asarray(
            r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
        q_atts = jnp.ones((B, T), jnp.int32)
        a_ids = jnp.asarray(
            r.randint(3, cfg.text.vocab_size - 1, (B, A)), jnp.int32)
        a_atts = jnp.ones((B, A), jnp.int32)
        batch = (images, q_ids, q_atts, a_ids, a_atts,
                 jnp.arange(B, dtype=jnp.int32),
                 jnp.full((B,), 1.0, jnp.float32))
        params = model.init({"params": jax.random.PRNGKey(0)}, images, q_ids,
                            q_atts, method=XFMForVQA.init_all)["params"]

        def loss_fn(p, batch, rng):
            return model.apply({"params": p}, *batch, train=True,
                               deterministic=True), {}
    elif mode == "retrieval_train":
        from xfm_tpu.models.task_models import XFMForRetrieval

        B, T = int(os.environ.get("XFM_FT_BATCH", "32")), 40
        cfg = _xfm_config(image_res=384)
        model = XFMForRetrieval(cfg)
        res = cfg.vision.image_res
        images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
        ids = jnp.asarray(
            r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
        atts = jnp.ones((B, T), jnp.int32)
        batch = (images, ids, atts)
        params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                            atts, method=XFMForRetrieval.init_all)["params"]

        def loss_fn(p, batch, rng):
            itc, itm = model.apply({"params": p}, *batch, deterministic=True,
                                   rngs={"hardneg": rng})
            return itc + itm, {}
    elif mode == "retrieval_rerank":
        # eval stage 2 forward (no train step): the 8-image × k_test=256
        # ITM rerank chunk exactly as bench_finetune.retrieval_rerank times
        from xfm_tpu.models.task_models import XFMForRetrieval

        k_test = int(os.environ.get("XFM_FT_KTEST", "256"))
        chunk = int(os.environ.get("XFM_FT_CHUNK", "8"))
        T = 40
        cfg = _xfm_config(image_res=384)
        model = XFMForRetrieval(cfg)
        Nv = cfg.vision.num_patches + 1
        C = cfg.vision.embed_dim
        img_embeds = jnp.asarray(r.randn(chunk, Nv, C), jnp.bfloat16)
        txt_embeds = jnp.asarray(r.randn(chunk * k_test, T, C), jnp.bfloat16)
        txt_atts = jnp.ones((chunk * k_test, T), jnp.int32)
        images = jnp.asarray(r.randn(2, cfg.vision.image_res,
                                     cfg.vision.image_res, 3), jnp.float32)
        ids = jnp.ones((2, T), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                            jnp.ones((2, T), jnp.int32),
                            method=XFMForRetrieval.init_all)["params"]

        @jax.jit
        def run_eval(params, ie, te, ta, salt):
            f = (1.0 + 1e-6 * salt).astype(ie.dtype)
            s = model.apply({"params": params},
                            jnp.repeat(ie * f, k_test, axis=0), te, ta,
                            method=XFMForRetrieval.itm_scores)
            return jnp.sum(s)

        _ = float(run_eval(params, img_embeds, txt_embeds, txt_atts,
                           jnp.float32(0.0)))
        jax.profiler.start_trace(logdir)
        _ = float(run_eval(params, img_embeds, txt_embeds, txt_atts,
                           jnp.float32(1.0)))
        jax.profiler.stop_trace()
        return
    else:
        raise SystemExit(f"unknown mode {mode}")

    clip = 1.0 if os.environ.get("XFM_FT_CLIP", "0") == "1" else None
    tx = create_optimizer(params, linear_warmup_decay(1e-4, 1000, 100),
                          clip_grad_norm=clip)
    state = TrainState.create(params, tx)

    # same 6-step scan as bench_finetune._train_harness so the persistent
    # compile cache entry from a bench run is reused
    iters = int(os.environ.get("XFM_FT_ITERS", "6"))

    @partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, batch, rng):
        def body(carry, _):
            st, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, _), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, sub), has_aux=True)(st.params)
            return (st.apply_gradients(grads), rng), loss

        (state, _), losses = jax.lax.scan(body, (state, rng),
                                          jnp.arange(iters))
        return state, losses[-1]

    rng = jax.random.PRNGKey(0)
    state, loss = run_steps(state, batch, rng)  # compile
    _ = float(loss)
    jax.profiler.start_trace(logdir)
    state, loss = run_steps(state, batch, jax.random.fold_in(rng, 7))
    _ = float(loss)
    jax.profiler.stop_trace()


def main():
    # positional mode = first token that is neither a flag nor a flag value
    # (--top takes one)
    flag_values = set()
    if "--top" in sys.argv:
        i = sys.argv.index("--top")
        if i + 1 < len(sys.argv):
            flag_values.add(i + 1)
    mode = next((a for i, a in enumerate(sys.argv) if i >= 1
                 and not a.startswith("--") and i not in flag_values),
                "vqa_train")
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    logdir = f"/tmp/xfm_profile_{mode}"
    existing = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not existing or "--fresh" in sys.argv:
        capture(mode, logdir)
        existing = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)

    path = max(existing, key=os.path.getmtime)
    print(f"# parsing {path}")
    totals, counts, planes, by_line, busy = op_totals(path)
    allv = []
    for ln, iv in busy.items():
        u = interval_union(list(iv))
        allv += iv
        print(f"# line {ln!r}: {u / 1e9:.3f} ms union-busy")
    if allv:
        span = max(e for _, e in allv) - min(s for s, _ in allv)
        u = interval_union(allv)
        print(f"# device union-busy {u / 1e9:.3f} ms / span "
              f"{span / 1e9:.3f} ms = {100 * u / span:.1f}% busy")
    total_ps = sum(totals.values())
    if not total_ps:
        raise SystemExit("no device ops parsed — rerun with --fresh")
    print(f"# leaf-op time over 3 steps: {total_ps / 1e9:.3f} ms summed")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  "
              f"×{counts[name]:<6d} {name[:120]}")


if __name__ == "__main__":
    main()
