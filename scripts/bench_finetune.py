"""Fine-tune-shape and eval-path throughput benchmarks on the real chip.

bench.py covers the 224px pretrain step; the reference's fine-tune
workloads run at 384px (retrieval, N=577 vision tokens; reference
configs/xfm-ft/Retrieval_coco.yaml) and 480px (VQA/grounding, N=901;
reference configs/xfm-ft/VQA.yaml), and its eval wall-time is dominated by
ITM reranking (k_test=256 per row), VQA rank_answer (k=128 re-scored
candidates) and caption decoding. This script measures each on the TPU.

  python scripts/bench_finetune.py retrieval_train [vqa_train ...]
  python scripts/bench_finetune.py all

Env: XFM_FT_BATCH overrides the per-mode reference batch size;
XFM_SHARED_CROSS_KV=1 A/Bs the shared cross-k/v projection
(PERF.md predicted it wins at these resolutions); XFM_REMAT=1 +
XFM_REMAT_POLICY for memory-bound shapes. Fine-tune benches use the
reference-faithful erf GELU (released checkpoints were trained with it),
unlike bench.py's from-scratch tanh recipe.

Prints one JSON line per mode.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
os.environ.setdefault("XFM_BENCH_ACT", "gelu")  # erf: fine-tune recipe

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _xfm_config as _base_config
from bench import peak_flops_per_chip, transformer_flops


def _xfm_config(image_res):
    """Base config at the fine-tune resolution; XFM_FT_TINY=1 shrinks every
    dimension for a CPU smoke run of the harness itself."""
    if os.environ.get("XFM_FT_TINY", "0") == "1":
        return _base_config(hidden=64, layers=2, heads=2, inter=128,
                            image_res=min(image_res, 64), vocab=512)
    return _base_config(image_res=image_res)


def _rtt(x):
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(x)
    return (time.perf_counter() - t0) / 5


def _time(fn, iters):
    """fn() -> a scalar-fetchable array; returns seconds per call."""
    out = fn()
    rtt = _rtt(out)
    t0 = time.perf_counter()
    out = fn()
    _ = float(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def _time_salted(fn, iters):
    """fn(salt) -> scalar array. Like _time but every call carries a fresh
    scalar input: re-dispatching an executable with IDENTICAL argument
    buffers can be deduped by the axon tunnel (measured ~0 s for the
    second call of heavy eval jits), so each timed call must differ."""
    out = fn(jnp.float32(0.0))
    _ = float(out)
    rtt = _rtt(out)
    t0 = time.perf_counter()
    out = fn(jnp.float32(1.0))
    _ = float(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters


def _emit(mode, value, unit, mfu=None, extra=None):
    rec = {"mode": mode, "value": round(value, 2), "unit": unit}
    if mfu is not None:
        rec["mfu"] = round(mfu, 4)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def _train_harness(model, params, loss_fn, batch, iters):
    from xfm_tpu.train.optim import create_optimizer, with_master_weights
    from xfm_tpu.train.schedules import linear_warmup_decay
    from xfm_tpu.train.train_state import TrainState

    # no grad clip: the reference fine-tune loops use bare AdamW (clipping
    # is an accelerator feature their plain scripts bypass); the ~350
    # per-leaf norm reduces cost ~10% of the 480px step. XFM_FT_CLIP=1
    # A/Bs the clipped optimizer.
    clip = 1.0 if os.environ.get("XFM_FT_CLIP", "0") == "1" else None
    tx = create_optimizer(params, linear_warmup_decay(1e-4, 1000, 100),
                          clip_grad_norm=clip)
    if os.environ.get("XFM_BF16_PARAMS", "0") == "1":
        tx = with_master_weights(tx)
    state = TrainState.create(params, tx)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state, batch, rng):
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
    state, loss = run(state, batch, rng)  # compile + warm
    _ = float(loss)
    holder = [state]

    def once():
        st, loss = run(holder[0], batch, jax.random.fold_in(rng, 1))
        holder[0] = st
        return loss

    return _time(once, iters)


def retrieval_train():
    """384px ITC+ITM train step (reference Retrieval_coco.yaml: B=32, T=40,
    3B-row hard-negative fusion pass)."""
    from xfm_tpu.models.task_models import XFMForRetrieval

    B = int(os.environ.get("XFM_FT_BATCH", "32"))
    T = 40
    cfg = _xfm_config(image_res=384)
    model = XFMForRetrieval(cfg)
    res = cfg.vision.image_res
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    ids = jnp.asarray(r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
    atts = jnp.ones((B, T), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids, atts,
                        method=XFMForRetrieval.init_all)["params"]

    def loss_fn(p, batch, rng):
        itc, itm = model.apply({"params": p}, *batch, deterministic=True,
                               rngs={"hardneg": rng})
        return itc + itm, {}

    iters = int(os.environ.get("XFM_FT_ITERS", "6"))
    dt = _train_harness(model, params, loss_fn, (images, ids, atts), iters)

    Nv = cfg.vision.num_patches + 1
    fwd = (transformer_flops(12, 768, 3072, Nv, B)
           + transformer_flops(12, 768, 3072, T, B)
           + transformer_flops(12, 768, 3072, T, 3 * B, cross_kv=Nv))
    mfu = 3 * fwd / dt / peak_flops_per_chip()
    _emit("retrieval_train_384px", B / dt, "samples/s/chip", mfu,
          {"batch": B, "ms_per_step": round(dt * 1e3, 1),
           "shared_cross_kv": os.environ.get("XFM_SHARED_CROSS_KV", "0")})


def vqa_train():
    """480px VQA answer-CE train step (reference VQA.yaml: B=24, T=40;
    one answer per question, A=8 tokens)."""
    from xfm_tpu.models.generation import XFMForVQA

    B = int(os.environ.get("XFM_FT_BATCH", "24"))
    T, A = 40, 8
    cfg = _xfm_config(image_res=480)
    model = XFMForVQA(cfg)
    res = cfg.vision.image_res
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    q_ids = jnp.asarray(r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
    q_atts = jnp.ones((B, T), jnp.int32)
    a_ids = jnp.asarray(r.randint(3, cfg.text.vocab_size - 1, (B, A)), jnp.int32)
    a_atts = jnp.ones((B, A), jnp.int32)
    ques_idx = jnp.arange(B, dtype=jnp.int32)
    weights = jnp.full((B,), 1.0, jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, q_ids,
                        q_atts, method=XFMForVQA.init_all)["params"]

    def loss_fn(p, batch, rng):
        loss = model.apply({"params": p}, *batch, train=True,
                           deterministic=True)
        return loss, {}

    iters = int(os.environ.get("XFM_FT_ITERS", "6"))
    dt = _train_harness(model, params, loss_fn,
                        (images, q_ids, q_atts, a_ids, a_atts, ques_idx,
                         weights), iters)

    Nv = cfg.vision.num_patches + 1
    fwd = (transformer_flops(12, 768, 3072, Nv, B)
           + transformer_flops(12, 768, 3072, T, B)
           + transformer_flops(12, 768, 3072, T, B, cross_kv=Nv)
           + transformer_flops(12, 768, 3072, A, B, cross_kv=T,
                               vocab=cfg.text.vocab_size))
    mfu = 3 * fwd / dt / peak_flops_per_chip()
    _emit("vqa_train_480px", B / dt, "samples/s/chip", mfu,
          {"batch": B, "ms_per_step": round(dt * 1e3, 1),
           "shared_cross_kv": os.environ.get("XFM_SHARED_CROSS_KV", "0")})


def grounding_train():
    """Grounding bbox-regression train step (reference Grounding_bbox.yaml:
    384px, B=20, T=40; L1+GIoU on the fusion-cls bbox head — reference
    Grounding_bbox.py, models/model_grounding.py). XFM_FT_RES=480 measures
    the high-res variant."""
    from xfm_tpu.models.task_models import XFMForGrounding

    B = int(os.environ.get("XFM_FT_BATCH", "20"))
    res_req = int(os.environ.get("XFM_FT_RES", "384"))
    T = 40
    cfg = _xfm_config(image_res=res_req)
    model = XFMForGrounding(cfg)
    res = cfg.vision.image_res
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    ids = jnp.asarray(r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
    atts = jnp.ones((B, T), jnp.int32)
    cxcy = r.uniform(0.3, 0.7, (B, 2))
    wh = r.uniform(0.1, 0.25, (B, 2))
    target = jnp.asarray(np.concatenate([cxcy, wh], 1), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids, atts,
                        method=XFMForGrounding.init_all)["params"]

    def loss_fn(p, batch, rng):
        lb, lg = model.apply({"params": p}, *batch, train=True,
                             deterministic=True)
        return lb + lg, {}

    iters = int(os.environ.get("XFM_FT_ITERS", "6"))
    dt = _train_harness(model, params, loss_fn, (images, ids, atts, target),
                        iters)

    Nv = cfg.vision.num_patches + 1
    fwd = (transformer_flops(12, 768, 3072, Nv, B)
           + transformer_flops(12, 768, 3072, T, B)
           + transformer_flops(12, 768, 3072, T, B, cross_kv=Nv))
    mfu = 3 * fwd / dt / peak_flops_per_chip()
    _emit(f"grounding_train_{res}px", B / dt, "samples/s/chip", mfu,
          {"batch": B, "ms_per_step": round(dt * 1e3, 1),
           "shared_cross_kv": os.environ.get("XFM_SHARED_CROSS_KV", "0")})


def beit_large():
    """beit2-large (1024×24, reference models/beit2.py:548 /
    configs/model/config_beit2_large.json) vision tower fwd+bwd at 224px
    with an avgpool classifier head — the ImageNet fine-tune shape at the
    larger scale. XFM_BF16_PARAMS=1 A/Bs bf16 live params + fp32-master
    optimizer (PERF.md's 'wins at larger models' claim); XFM_REMAT /
    XFM_REMAT_POLICY for memory-bound batch sizes."""
    import flax.linen as nn

    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig

    B = int(os.environ.get("XFM_FT_BATCH", "32"))
    res = int(os.environ.get("XFM_FT_RES", "224"))
    n_cls = 1000
    remat = os.environ.get("XFM_REMAT", "0") == "1"
    kw = dict(
        image_res=res, drop_path_rate=0.0, use_rel_pos_bias=True,
        use_abs_pos_emb=False, init_values=0.1, qkv_bias=True,
        use_mean_pooling=True, dtype=jnp.bfloat16,
        hidden_act=os.environ.get("XFM_BENCH_ACT", "gelu"),
        remat=remat,
        remat_policy=os.environ.get("XFM_REMAT_POLICY", "full"))
    if os.environ.get("XFM_FT_TINY", "0") == "1":
        kw.update(image_res=min(res, 64))
        vcfg = VisionConfig(embed_dim=64, depth=2, num_heads=2, **kw)
        n_cls = 10
    else:
        vcfg = VisionConfig.beit_large(**kw)
    res = vcfg.image_res

    class Classifier(nn.Module):
        @nn.compact
        def __call__(self, images, deterministic=True):
            h = BeitVisionTransformer(vcfg, name="vision")(
                images, deterministic=deterministic)
            return nn.Dense(n_cls, dtype=jnp.bfloat16, name="head")(
                h[:, 0, :])

    model = Classifier()
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    labels = jnp.asarray(r.randint(0, n_cls, (B,)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        images[:1])["params"]
    if os.environ.get("XFM_BF16_PARAMS", "0") == "1":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def loss_fn(p, batch, rng):
        logits = model.apply({"params": p}, batch[0]).astype(jnp.float32)
        lp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(lp, batch[1][:, None],
                                             axis=1))
        return loss, {}

    iters = int(os.environ.get("XFM_FT_ITERS", "6"))
    dt = _train_harness(model, params, loss_fn, (images, labels), iters)

    Nv = vcfg.num_patches + 1
    fwd = transformer_flops(24, 1024, 4096, Nv, B)
    mfu = 3 * fwd / dt / peak_flops_per_chip()
    _emit(f"beit_large_{res}px", B / dt, "samples/s/chip", mfu,
          {"batch": B, "ms_per_step": round(dt * 1e3, 1),
           "bf16_params": os.environ.get("XFM_BF16_PARAMS", "0"),
           "remat": os.environ.get("XFM_REMAT_POLICY", "none")
           if remat else "none"})


def retrieval_rerank():
    """Eval stage 2, i2t direction as the task runs it: `chunk` unique
    images × k_test=256 text candidates each (reference Retrieval.py:141-152
    — the eval cost center). Default XFM_EVAL_SHARED_KV=0 = the repeat
    formulation `tasks/retrieval.py rerank_scores` actually uses (shared-kv
    measured 2× slower at 577 image tokens, PERF.md round-4 phase-4); =1
    A/Bs the unique-image + in-layer k/v gather path."""
    from xfm_tpu.models.task_models import XFMForRetrieval

    k_test = int(os.environ.get("XFM_FT_KTEST", "256"))
    chunk = int(os.environ.get("XFM_FT_CHUNK", "8"))
    shared = os.environ.get("XFM_EVAL_SHARED_KV", "0") == "1"
    T = 40
    cfg = _xfm_config(image_res=384)
    model = XFMForRetrieval(cfg)
    r = np.random.RandomState(0)
    Nv = cfg.vision.num_patches + 1
    # device-resident synthetic embeds: isolates the rerank ITM cost
    C = cfg.vision.embed_dim
    img_embeds = jnp.asarray(r.randn(chunk, Nv, C), jnp.bfloat16)
    txt_embeds = jnp.asarray(r.randn(chunk * k_test, T, C), jnp.bfloat16)
    txt_atts = jnp.ones((chunk * k_test, T), jnp.int32)
    row_idx = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), k_test)
    images = jnp.asarray(r.randn(2, cfg.vision.image_res,
                           cfg.vision.image_res, 3), jnp.float32)
    ids = jnp.ones((2, T), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                        jnp.ones((2, T), jnp.int32),
                        method=XFMForRetrieval.init_all)["params"]

    iters = int(os.environ.get("XFM_FT_ITERS", "4"))

    # ONE salted chunk call per measurement — exactly the task's dispatch
    # shape (tasks/retrieval.py rerank_scores). A lax.scan wrapper measured
    # a ~2.3x-inflated HBM liveness (multiple iterations' per-layer k/v
    # buffers held live) and OOM'd the row-gather path; single calls match
    # the production peak.
    grouped = os.environ.get("XFM_EVAL_GROUPED", "0") == "1"

    @jax.jit
    def run(params, ie, te, ta, ri, salt):
        f = (1.0 + 1e-6 * salt).astype(ie.dtype)
        if grouped:
            # grouped-batch: per-unique-image k/v, queries viewed per group
            s = model.apply({"params": params}, ie * f, te, ta,
                            image_group_size=k_test,
                            method=XFMForRetrieval.itm_scores)
        elif shared:
            s = model.apply({"params": params}, ie * f, te, ta,
                            image_row_idx=ri,
                            method=XFMForRetrieval.itm_scores)
        else:
            s = model.apply({"params": params},
                            jnp.repeat(ie * f, k_test, axis=0), te, ta,
                            method=XFMForRetrieval.itm_scores)
        return jnp.sum(s)

    dt = _time_salted(lambda salt: run(params, img_embeds, txt_embeds,
                                       txt_atts, row_idx, salt), 1)
    rows = chunk  # one "row" = k_test candidate scores
    fwd = transformer_flops(12, 768, 3072, T, chunk * k_test, cross_kv=Nv)
    _emit("retrieval_rerank_384px", rows / dt, "rows/s/chip",
          fwd / dt / peak_flops_per_chip(),
          {"k_test": k_test, "shared_kv": int(shared),
           "grouped": int(grouped),
           "itm_forwards_per_s": round(chunk * k_test / dt, 1)})


def vqa_rank():
    """rank_answer over a 3128-answer list with k=128 full re-scoring at
    480px (reference models/model_generation.py:146-202)."""
    from xfm_tpu.models.generation import XFMForVQA

    B = int(os.environ.get("XFM_FT_BATCH", "16"))
    k = 128
    T, L, n_ans = 40, 10, 3128
    cfg = _xfm_config(image_res=480)
    model = XFMForVQA(cfg)
    res = cfg.vision.image_res
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    q_ids = jnp.asarray(r.randint(3, cfg.text.vocab_size - 1, (B, T)), jnp.int32)
    q_atts = jnp.ones((B, T), jnp.int32)
    ans_ids = jnp.asarray(
        np.concatenate([np.zeros((n_ans, 1), np.int64),
                        r.randint(3, cfg.text.vocab_size - 1, (n_ans, L - 1))], axis=1),
        jnp.int32)
    ans_atts = jnp.ones((n_ans, L), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, q_ids,
                        q_atts, method=XFMForVQA.init_all)["params"]

    # single salted call per measurement (see retrieval_rerank: scan
    # wrappers inflate liveness; identical re-dispatches get deduped)
    @jax.jit
    def rank(params, images, q_ids, q_atts, salt):
        im = images * (1.0 + 1e-6 * salt)
        ids, probs = model.apply({"params": params}, im, q_ids, q_atts,
                                 train=False, answer_list_ids=ans_ids,
                                 answer_list_atts=ans_atts, k=k)
        return jnp.sum(probs)

    dt = _time_salted(
        lambda salt: rank(params, images, q_ids, q_atts, salt), 1)
    _emit("vqa_rank_480px", B / dt, "questions/s/chip", None,
          {"k": k, "answers": n_ans, "ms_per_batch": round(dt * 1e3, 1),
           "shared_kv": os.environ.get("XFM_EVAL_SHARED_KV", "2")})


def caption_decode():
    """Greedy + beam-3 caption decode at 384px, 20 tokens (reference
    Captioning.py eval; models/model_generation.py:256-385)."""
    from xfm_tpu.models.generation import (XFMForCaptioning, beam_generate,
                                           generate)

    B = int(os.environ.get("XFM_FT_BATCH", "32"))
    max_len = 20
    cfg = _xfm_config(image_res=384)
    model = XFMForCaptioning(cfg, max_decode_len=max_len + 2)
    res = cfg.vision.image_res
    r = np.random.RandomState(0)
    images = jnp.asarray(r.randn(B, res, res, 3), jnp.float32)
    ids = jnp.ones((B, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                        jnp.ones((B, 8), jnp.int32),
                        method=XFMForCaptioning.init_all)["params"]
    variables = {"params": params}

    def greedy():
        seqs, _ = generate(model, variables, images, bos_id=0, eos_id=2,
                           pad_id=1, max_len=max_len, greedy=True)
        return jnp.sum(seqs)

    _ = float(greedy())  # compile
    dt = _time(greedy, 1)
    _emit("caption_greedy_384px", B / dt, "images/s/chip", None,
          {"tokens_per_s": round(B * max_len / dt, 1),
           "ms_per_batch": round(dt * 1e3, 1)})

    nb = 3

    def beam():
        seqs = beam_generate(model, variables, images, bos_id=0, eos_id=2,
                             pad_id=1, max_len=max_len, num_beams=nb)
        return jnp.sum(seqs)

    _ = float(beam())
    dt = _time(beam, 1)
    _emit("caption_beam3_384px", B / dt, "images/s/chip", None,
          {"tokens_per_s": round(B * max_len / dt, 1),
           "ms_per_batch": round(dt * 1e3, 1)})


MODES = {
    "retrieval_train": retrieval_train,
    "vqa_train": vqa_train,
    "grounding_train": grounding_train,
    "beit_large": beit_large,
    "retrieval_rerank": retrieval_rerank,
    "vqa_rank": vqa_rank,
    "caption_decode": caption_decode,
}


def main():
    args = sys.argv[1:] or ["all"]
    modes = list(MODES) if args == ["all"] else args
    for m in modes:
        MODES[m]()


if __name__ == "__main__":
    main()
