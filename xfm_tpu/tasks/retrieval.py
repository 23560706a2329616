"""Image-text retrieval fine-tune + two-stage evaluation
(reference Retrieval.py).

Eval (reference Retrieval.py:77-184): encode all texts and images → ITC
similarity matrix → top-k_test rerank with the ITM head. The reference
row-slices work across ranks and all_reduces dense score matrices
(reference Retrieval.py:135-178); here the rerank is a jitted per-chunk ITM
scorer and multi-host sharding comes from running disjoint row chunks per
process.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.finetune_data import RetrievalEvalData, RetrievalTrainData
from ..data.transforms import TestTransform, TrainTransform
from ..models import XFMForRetrieval, config_from_yaml
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch


def encode_corpus(model, params, eval_data: RetrievalEvalData,
                  batch_size: int, text_batch_size: int = 0):
    """Stage 1: features for every image and text
    (reference Retrieval.py:99-130; texts use `batch_size_test_text`
    when set — Retrieval.py:244-245)."""
    text_batch_size = text_batch_size or batch_size

    @jax.jit
    def enc_img(params, images):
        return model.apply({"params": params}, images,
                           method=XFMForRetrieval.encode_images)

    @jax.jit
    def enc_txt(params, ids, atts):
        return model.apply({"params": params}, ids, atts,
                           method=XFMForRetrieval.encode_texts)

    img_embeds, img_feats = [], []
    for images in eval_data.image_batches(batch_size):
        e, f = enc_img(params, jnp.asarray(images))
        img_embeds.append(np.asarray(e))
        img_feats.append(np.asarray(f))
    txt_embeds, txt_feats, txt_atts = [], [], []
    for ids, atts in eval_data.text_batches(text_batch_size):
        e, f = enc_txt(params, jnp.asarray(ids), jnp.asarray(atts))
        txt_embeds.append(np.asarray(e))
        txt_feats.append(np.asarray(f))
        txt_atts.append(atts)
    return (np.concatenate(img_embeds), np.concatenate(img_feats),
            np.concatenate(txt_embeds), np.concatenate(txt_feats),
            np.concatenate(txt_atts))


def rerank_scores(model, params, img_embeds, txt_embeds, txt_atts, sims,
                  k_test: int, chunk: int = 8,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """Stage 2 (reference Retrieval.py:135-173): ITM logits on the top-k_test
    candidates in both directions. Returns (score_i2t, score_t2i) filled with
    -100 off the candidate set.

    Multi-host: each process reranks its `process_index`-strided row slice
    only (reference Retrieval.py:135-139 row-slices across ranks);
    `merge_rerank_scores` combines the slices — eval wall-time scales with
    1/process_count."""
    pid = jax.process_index() if process_index is None else process_index
    pcount = jax.process_count() if process_count is None else process_count

    @jax.jit
    def itm_chunk(params, image_embeds, text_embeds, text_atts):
        return model.apply({"params": params}, image_embeds, text_embeds,
                           text_atts, method=XFMForRetrieval.itm_scores)

    @partial(jax.jit, static_argnums=(4,))
    def itm_chunk_grouped(params, image_embeds, text_embeds, text_atts, gs):
        return model.apply({"params": params}, image_embeds, text_embeds,
                           text_atts, image_group_size=gs,
                           method=XFMForRetrieval.itm_scores)

    n_img, n_txt = sims.shape
    score_i2t = np.full((n_img, n_txt), -100.0, np.float32)
    topk_t = np.argsort(-sims, axis=1)[:, :k_test]
    my_img_rows = np.arange(pid, n_img, pcount)
    for s in range(0, len(my_img_rows), chunk):
        rows = my_img_rows[s:s + chunk]
        # grouped-batch formulation (round 5): each image's k_test
        # candidates are contiguous, so cross-attention views the queries
        # per unique image against once-projected k/v — nothing is
        # repeated (the reference formulation recomputes the k/v
        # projections k_test× per image, Retrieval.py:141-152) and
        # nothing is gathered per layer (the round-4 row-idx variant's
        # loss). Measured 22.3 vs 8.4 rows/s (+166%) at 384px k_test=256
        # on v5e; equality with the repeat formulation is pinned in
        # tests/test_retrieval_shard.py. XFM_EVAL_GROUPED=0 restores the
        # reference repeat formulation.
        cand = topk_t[rows].reshape(-1)
        if os.environ.get("XFM_EVAL_GROUPED", "1") == "1":
            scores = itm_chunk_grouped(params, jnp.asarray(img_embeds[rows]),
                                       jnp.asarray(txt_embeds[cand]),
                                       jnp.asarray(txt_atts[cand]), k_test)
        else:
            im = np.repeat(img_embeds[rows], k_test, axis=0)
            scores = itm_chunk(params, jnp.asarray(im),
                               jnp.asarray(txt_embeds[cand]),
                               jnp.asarray(txt_atts[cand]))
        scores = np.asarray(scores).reshape(len(rows), k_test)
        for j, r in enumerate(rows):
            score_i2t[r, topk_t[r]] = scores[j]

    score_t2i = np.full((n_txt, n_img), -100.0, np.float32)
    topk_i = np.argsort(-sims.T, axis=1)[:, :k_test]
    my_txt_rows = np.arange(pid, n_txt, pcount)
    for s in range(0, len(my_txt_rows), chunk):
        rows = my_txt_rows[s:s + chunk]
        cand = topk_i[rows].reshape(-1)
        te = np.repeat(txt_embeds[rows], k_test, axis=0)
        ta = np.repeat(txt_atts[rows], k_test, axis=0)
        scores = itm_chunk(params, jnp.asarray(img_embeds[cand]),
                           jnp.asarray(te), jnp.asarray(ta))
        scores = np.asarray(scores).reshape(len(rows), k_test)
        for j, r in enumerate(rows):
            score_t2i[r, topk_i[r]] = scores[j]
    return score_i2t, score_t2i


def merge_rerank_scores(score_i2t, score_t2i):
    """Combine per-process row slices: every row is owned by exactly one
    process (all its entries on non-owners hold the -100 fill). Summing
    across processes and adding back the (P-1)x(-100) shift reconstructs
    the owner's values EXACTLY — including genuine ITM logits below -100,
    which an elementwise max against the fill would clamp (the reference
    all_reduces the -100-filled matrices and relies on the uniform shift
    not changing per-row ranking, Retrieval.py:175-178; the explicit
    un-shift here keeps absolute scores identical to a single-process run).
    Gathered in row chunks so peak host memory is ~P x chunk, not
    P x full-matrix. No-op on one process."""
    if jax.process_count() == 1:
        return score_i2t, score_t2i
    from jax.experimental import multihost_utils

    shift = 100.0 * (jax.process_count() - 1)

    def merge(mat, chunk=1024):
        out = np.empty_like(mat)
        for s in range(0, mat.shape[0], chunk):
            part = np.asarray(multihost_utils.process_allgather(
                mat[s:s + chunk]))
            # f64 accumulation: f32 inputs are exact in f64, so
            # owner + (P-1)·(-100) + (P-1)·100 reconstructs the owner's f32
            # value BIT-exactly (an f32 sum would round through the ±100
            # excursion, ~1e-5 error at |score|≈50)
            acc = part.astype(np.float64).sum(axis=0) + shift
            out[s:s + chunk] = acc.astype(mat.dtype)
        return out

    return merge(score_i2t), merge(score_t2i)


def itm_eval(score_i2t, score_t2i, img2txt, txt2img) -> dict:
    """R@1/5/10 both directions (reference Retrieval.py:187-231)."""
    ranks = np.zeros(score_i2t.shape[0])
    for i, row in enumerate(score_i2t):
        order = np.argsort(-row)
        best = 1e20
        for t in img2txt[i]:
            r = np.where(order == t)[0][0]
            best = min(best, r)
        ranks[i] = best
    tr1, tr5, tr10 = [100.0 * np.mean(ranks < k) for k in (1, 5, 10)]

    ranks = np.zeros(score_t2i.shape[0])
    for t, row in enumerate(score_t2i):
        order = np.argsort(-row)
        ranks[t] = np.where(order == txt2img[t])[0][0]
    ir1, ir5, ir10 = [100.0 * np.mean(ranks < k) for k in (1, 5, 10)]

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return dict(txt_r1=tr1, txt_r5=tr5, txt_r10=tr10, img_r1=ir1,
                img_r5=ir5, img_r10=ir10, txt_r_mean=tr_mean,
                img_r_mean=ir_mean, r_mean=(tr_mean + ir_mean) / 2)


def evaluation(model, params, eval_data: RetrievalEvalData, config: dict):
    batch = config.get("batch_size_test", 32)
    img_embeds, img_feats, txt_embeds, txt_feats, txt_atts = encode_corpus(
        model, params, eval_data, batch,
        config.get("batch_size_test_text", 0))
    sims = img_feats @ txt_feats.T
    k_test = min(config.get("k_test", 256), sims.shape[1], sims.shape[0])
    s_i2t, s_t2i = rerank_scores(model, params, img_embeds, txt_embeds,
                                 txt_atts, sims, k_test)
    s_i2t, s_t2i = merge_rerank_scores(s_i2t, s_t2i)
    return itm_eval(s_i2t, s_t2i, eval_data.img2txt, eval_data.txt2img)


def build_tokenizer_or_fallback(cfg, texts_fn=None):
    from ..data.tokenization import SimpleTokenizer, build_tokenizer

    try:
        return build_tokenizer(cfg["text_encoder"])
    except Exception:
        print("### falling back to SimpleTokenizer", flush=True)
        texts = texts_fn() if texts_fn else []
        return SimpleTokenizer.from_texts(texts)


def main(args, config: Optional[dict] = None):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 384)

    eval_ann = cfg.get("test_file") or cfg.get("val_file")
    train_ann = cfg.get("train_file")
    tokenizer = build_tokenizer_or_fallback(
        cfg, lambda: _ann_texts(train_ann or eval_ann))

    mcfg = config_from_yaml(cfg, use_contrastive_loss=True,
                            use_matching_loss=True)
    mcfg = _maybe_shrink_vocab(mcfg, tokenizer)
    model = XFMForRetrieval(mcfg)

    test_data = RetrievalEvalData(eval_ann, TestTransform(image_res),
                                  cfg["image_root"], tokenizer,
                                  max_tokens=cfg.get("max_tokens", 40))

    bsz = cfg.get("batch_size_train", 32)
    train_data = None
    steps_per_epoch = 1
    if not args.evaluate:
        train_data = RetrievalTrainData(
            train_ann, TrainTransform(image_res), cfg["image_root"],
            tokenizer, max_tokens=cfg.get("max_tokens", 40),
            batch_size=bsz)
        steps_per_epoch = max(1, len(train_data) // bsz)

    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, cfg.get("max_tokens", 40)),
                                     jnp.int32),
                   text_atts=jnp.ones((2, cfg.get("max_tokens", 40)),
                                      jnp.int32))
    state, sched = build_state(ctx, model, example,
                               XFMForRetrieval.init_all, steps_per_epoch)

    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        imported = import_xfm_checkpoint(sd, mcfg)
        params, missing, unexpected = merge_params(state.params,
                                                   to_jax(imported))
        state = state.replace(params=params)
        print(f"### loaded {args.checkpoint}: {len(missing)} missing",
              flush=True)

    if args.evaluate:
        metrics = evaluation(model, state.params, test_data, cfg)
        if is_main_process():
            print(metrics, flush=True)
            append_log(ctx.out_dir, {"eval": metrics})
        return metrics

    def loss_fn(params, batch, rng):
        loss_itc, loss_itm = model.apply(
            {"params": params}, batch["images"], batch["text_ids"],
            batch["text_atts"], idx=batch["idx"], deterministic=False,
            rngs={"hardneg": rng, "dropout": jax.random.fold_in(rng, 1)})
        return loss_itc + loss_itm, {"loss_itc": loss_itc,
                                     "loss_itm": loss_itm}

    from .common import make_task_step

    # `accumulate_steps` (reference Retrieval.py:45,55-65): K micro-batches
    # per optimizer step
    step_fn, accum = make_task_step(ctx, loss_fn)
    rng = task_rng(ctx)
    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    # zero-shot evaluation before training (reference Retrieval.py:330-337);
    # with epochs: 0 this IS the result (the *_zero configs)
    zs = evaluation(model, state.params, test_data, cfg)
    append_log(ctx.out_dir, {"epoch": -1, **zs})
    if is_main_process():
        print(f"zero-shot: {zs}", flush=True)
    best = zs["r_mean"]
    epochs = int(cfg.get("schedular", {}).get("epochs", 5))
    if epochs == 0:
        return zs
    for epoch in range(start_epoch, epochs):
        loader = train_data.epoch(epoch_seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched, accum_steps=accum)
        metrics = evaluation(model, state.params, test_data, cfg)
        append_log(ctx.out_dir, {"epoch": epoch, **stats, **metrics})
        if is_main_process():
            print(f"epoch {epoch}: {metrics}", flush=True)
        save_epoch_checkpoint(ctx, state, epoch)
        if metrics["r_mean"] > best:
            best = metrics["r_mean"]
            save_epoch_checkpoint(ctx, state, epoch, name="ckpt_best",
                                  keep=1)
    return {"best_r_mean": best}


def _ann_texts(ann_file):
    import json

    if isinstance(ann_file, str):
        ann_file = [ann_file]
    texts = []
    for f in ann_file:
        with open(f) as fh:
            for a in json.load(fh):
                c = a.get("caption", "")
                texts.extend(c if isinstance(c, list) else [c])
    return texts


def _maybe_shrink_vocab(mcfg, tokenizer):
    import dataclasses as dc

    vs = getattr(tokenizer, "vocab_size", None)
    if vs and vs != mcfg.text.vocab_size:
        text = dc.replace(mcfg.text, vocab_size=max(vs, 16))
        fusion = dc.replace(mcfg.fusion, vocab_size=max(vs, 16))
        mcfg = dc.replace(mcfg, text=text, fusion=fusion)
    return mcfg
