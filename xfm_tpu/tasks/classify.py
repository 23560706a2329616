"""Generic classification stream (reference Classify.py — note the reference
version is broken: imports a nonexistent XVLMForClassification and
create_dataset('classify') raises; this is the working equivalent, same CLI).

Data: jsonl with {"text": ...} and/or {"image": path} plus {"label": int}.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import TestTransform, TrainTransform, decode_image
from ..models import XFMForClassification, config_from_yaml
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def batches(rows, tokenizer, transform, image_root, max_tokens, batch_size,
            shuffle=True, seed=0, drop_last=True):
    from ..data.finetune_data import _encode_texts

    idx = np.arange(len(rows))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    buf = []
    for i in idx:
        buf.append(rows[int(i)])
        if len(buf) == batch_size:
            yield _pack(buf, tokenizer, transform, image_root, max_tokens)
            buf = []
    if buf and not drop_last:
        yield _pack(buf, tokenizer, transform, image_root, max_tokens)


def _pack(buf, tokenizer, transform, image_root, max_tokens):
    from ..data.finetune_data import _encode_texts

    out = {"targets": np.asarray([r["label"] for r in buf], np.int32)}
    if "text" in buf[0]:
        ids, atts = _encode_texts(tokenizer, [r["text"] for r in buf],
                                  max_tokens)
        out.update(text_ids=ids, text_atts=atts)
    if "image" in buf[0]:
        imgs = [transform(decode_image(
            os.path.join(image_root, r["image"]) if image_root
            else r["image"])) for r in buf]
        out["images"] = np.stack(imgs)
    return out


def main(args, config: Optional[dict] = None):
    # this task consumes parallel.pipe (text-only ablation only): the text
    # tower stages over the pipe mesh axis via core.pipeline GPipe
    ctx = TaskContext.from_args(args, allow_pipe=True)
    cfg = ctx.config
    pipe = int((cfg.get("parallel", {}) or {}).get("pipe", 1))
    if pipe > 1 and not cfg.get("use_text_classifier", False):
        raise ValueError(
            "parallel.pipe > 1 is consumed only by the text-only classifier "
            "ablation (use_text_classifier: true) in this task; the "
            "multimodal classifier shards over data/fsdp/tensor "
            "(docs/SCALING.md)")
    image_res = cfg.get("image_res", 224)
    tokenizer = build_tokenizer_or_fallback(cfg)
    mcfg = _maybe_shrink_vocab(config_from_yaml(cfg), tokenizer)
    num_labels = cfg.get("num_labels", 2)
    train_rows = load_rows(cfg["train_file"])
    val_rows = load_rows(cfg.get("val_file", cfg["train_file"]))
    has_img = "image" in train_rows[0]
    has_txt = "text" in train_rows[0]
    task_name = "fused" if (has_img and has_txt) else (
        "imagenet" if has_img else "glue")
    if cfg.get("use_text_classifier", False):
        # text-only ablation: plain text encoder + MLP head, no vision
        # params built (reference Classify.py use_text_classifier →
        # models/model_classification.py:98-150)
        from ..models.task_models import TextClassifier

        has_img = False
        task_name = "glue"
        model = TextClassifier(mcfg.text, num_labels=num_labels)
    else:
        model = XFMForClassification(mcfg, num_labels=num_labels,
                                     task_name=task_name,
                                     is_lp=cfg.get("is_lp", False))

    T = cfg.get("max_tokens", 40)
    bsz = cfg.get("batch_size", 16)
    example = {}
    if has_img:
        example["images"] = jnp.zeros((2, image_res, image_res, 3))
    if has_txt:
        example["text_ids"] = jnp.ones((2, T), jnp.int32)
        example["text_atts"] = jnp.ones((2, T), jnp.int32)
    steps = max(1, len(train_rows) // bsz)
    state, sched = build_state(ctx, model, example, type(model).init_all,
                               steps)
    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, _, _ = merge_params(state.params,
                                    to_jax(import_xfm_checkpoint(sd, mcfg)))
        state = state.replace(params=params)

    pipelined = None
    if pipe > 1:
        # GPipe-staged text tower (core/pipeline.py): layer stack lives
        # one-stage-per-device along the pipe axis, microbatches stream
        # through with ppermute; embeddings + MLP head run replicated.
        # Same param tree as TextClassifier — checkpoints interchange.
        from ..core.pipeline import pipelined_tower_forward
        from ..models.text_encoder import cross_entropy
        from ..models.xfm import MLPHead

        tcfg = mcfg.text
        if tcfg.fusion_layer != tcfg.num_hidden_layers:
            raise ValueError(
                "pipelined text classifier needs a pure self-attention "
                "stack: set text_fusion_start_at == text_num_hidden_layers")
        if tcfg.num_hidden_layers % pipe:
            raise ValueError(f"{tcfg.num_hidden_layers} layers not "
                             f"divisible into {pipe} pipeline stages")
        micro = int((cfg.get("parallel") or {}).get("microbatches",
                                                    2 * pipe))
        data_axes = tuple(a for a in ("data", "fsdp")
                          if ctx.mesh.shape.get(a, 1) > 1)
        # each microbatch is further sharded over the data axes, so batches
        # must divide by micro × (product of data-axis sizes)
        _dshards = 1
        for a in data_axes:
            _dshards *= ctx.mesh.shape[a]
        batch_multiple = micro * _dshards
        head = MLPHead(num_labels, dtype=tcfg.dtype)

        def pipelined(params, text_ids, text_atts, dropout_rng=None):
            with ctx.mesh:
                hidden = pipelined_tower_forward(
                    params["text_encoder"], tcfg, text_ids, text_atts,
                    ctx.mesh, num_microbatches=micro, data_axes=data_axes,
                    dropout_rng=dropout_rng)
            return head.apply({"params": params["cls_head"]},
                              hidden[:, 0, :])

        def pipelined_loss(params, batch, rng):
            # train-mode dropout: per-(stage, layer, microbatch, data-shard)
            # keys threaded through the pipeline consts (core/pipeline.py)
            drng = rng if (tcfg.hidden_dropout_prob > 0
                           or tcfg.attention_probs_dropout_prob > 0) else None
            pred = pipelined(params, batch["text_ids"], batch["text_atts"],
                             dropout_rng=drng)
            return cross_entropy(pred, batch["targets"]), {}

    tt_train = TrainTransform(image_res)
    tt_test = TestTransform(image_res)

    def evaluate(params):
        if pipelined is not None:
            @jax.jit
            def pfwd(params, text_ids, text_atts):
                return pipelined(params, text_ids, text_atts)

            correct = total = 0
            for b in batches(val_rows, tokenizer, tt_test,
                             cfg.get("image_root"), T, bsz, shuffle=False,
                             drop_last=False):
                n = len(b["targets"])
                pad = (-n) % batch_multiple  # microbatch + data-shard split
                ids = np.pad(b["text_ids"], ((0, pad), (0, 0)),
                             constant_values=1)
                atts = np.pad(b["text_atts"], ((0, pad), (0, 0)))
                pred = np.asarray(pfwd(params, jnp.asarray(ids),
                                       jnp.asarray(atts)))[:n]
                correct += int((pred.argmax(-1) == b["targets"]).sum())
                total += n
            return {"acc": correct / max(total, 1)}

        @jax.jit
        def fwd(params, **kw):
            return model.apply({"params": params}, train=False, **kw)

        correct = total = 0
        for b in batches(val_rows, tokenizer, tt_test,
                         cfg.get("image_root"), T, bsz, shuffle=False,
                         drop_last=False):
            kw = {k: jnp.asarray(v) for k, v in b.items()
                  if k != "targets"}
            pred = np.asarray(fwd(params, **kw))
            correct += int((pred.argmax(-1) == b["targets"]).sum())
            total += len(b["targets"])
        return {"acc": correct / max(total, 1)}

    if args.evaluate:
        m = evaluate(state.params)
        print(m, flush=True)
        return m

    def loss_fn(params, batch, rng):
        kw = {k: batch[k] for k in ("images", "text_ids", "text_atts")
              if k in batch}
        loss = model.apply({"params": params}, targets=batch["targets"],
                           train=True, deterministic=False,
                           rngs={"dropout": rng}, **kw)
        return loss, {}

    if pipelined is not None:
        loss_fn = pipelined_loss
    step_fn = make_train_step(loss_fn)
    rng = task_rng(ctx)
    best = 0.0
    for epoch in range(int(cfg.get("schedular", {}).get("epochs", 10))):
        loader = batches(train_rows, tokenizer, tt_train,
                         cfg.get("image_root"), T, bsz,
                         seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched)
        m = evaluate(state.params)
        append_log(ctx.out_dir, {"epoch": epoch, **stats, **m})
        if is_main_process():
            print(f"epoch {epoch}: {m}", flush=True)
        best = max(best, m["acc"])
    return {"best_acc": best}
