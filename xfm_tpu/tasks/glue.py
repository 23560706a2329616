"""GLUE fine-tuning (reference run_glue.py): text-only XFMForClassification.

The reference wraps HF Accelerate + HF datasets/metrics
(reference run_glue.py:100-143); here: one jitted train step over the mesh,
numpy GLUE metrics (xfm_tpu.eval.glue_metrics), and three data sources —
HF datasets (cached), local dataset dir (`glue_datasets` key), or jsonl files
(`train_file`/`validation_file`).
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import shard_batch
from ..eval import glue_metrics
from ..models import XFMForClassification, config_from_yaml
from ..train.metrics import is_main_process
from ..train.optim import create_optimizer
from ..train.schedules import linear_warmup_decay
from ..train.train_state import TrainState, make_train_step
from .common import (task_rng, TaskContext, append_log, opt_steps_per_epoch,
                     train_epoch)

TASK_KEYS = {
    "cola": ("sentence", None), "sst2": ("sentence", None),
    "mrpc": ("sentence1", "sentence2"), "qqp": ("question1", "question2"),
    "stsb": ("sentence1", "sentence2"),
    "mnli": ("premise", "hypothesis"), "qnli": ("question", "sentence"),
    "rte": ("sentence1", "sentence2"), "wnli": ("sentence1", "sentence2"),
}

TASK_NUM_LABELS = {"cola": 2, "sst2": 2, "mrpc": 2, "qqp": 2, "stsb": 1,
                   "mnli": 3, "qnli": 2, "rte": 2, "wnli": 2}


def load_glue_examples(config: dict, split: str):
    """→ list of (text_a, text_b|None, label)."""
    task = config["task_name"]
    k1, k2 = TASK_KEYS[task]

    file_key = {"train": "train_file", "validation": "validation_file",
                "validation_mismatched":
                    "validation_mismatched_file"}[split]
    if config.get(file_key):
        import json

        rows = []
        with open(config[file_key]) as f:
            for line in f:
                d = json.loads(line)
                rows.append((d[k1], d.get(k2) if k2 else None,
                             d["label"]))
        return rows

    ds_dir = config.get("glue_datasets")
    hf_split = split
    if split == "validation":
        hf_split = "validation_matched" if task == "mnli" else "validation"
    import datasets

    if ds_dir and os.path.isdir(os.path.join(str(ds_dir), task)):
        ds = datasets.load_from_disk(os.path.join(str(ds_dir), task))[hf_split]
    else:
        ds = datasets.load_dataset("glue", task, split=hf_split)
    return [(r[k1], r[k2] if k2 else None, r["label"]) for r in ds]


def make_tokenize_fn(tokenizer, max_length: int):
    def tokenize(pairs):
        texts = [(a if b is None else a + " " + tokenizer.sep_token + " " + b)
                 for a, b, _ in pairs]
        try:  # HF fast path: proper pair encoding
            if hasattr(tokenizer, "batch_encode_plus"):
                a_list = [a for a, _, _ in pairs]
                b_list = [b for _, b, _ in pairs]
                if b_list[0] is not None:
                    enc = tokenizer(a_list, b_list, max_length=max_length,
                                    padding="max_length", truncation=True)
                else:
                    enc = tokenizer(a_list, max_length=max_length,
                                    padding="max_length", truncation=True)
                return (np.asarray(enc["input_ids"], np.int32),
                        np.asarray(enc["attention_mask"], np.int32))
        except Exception:
            pass
        enc = tokenizer(texts, max_length=max_length)
        return enc["input_ids"], enc["attention_mask"]

    return tokenize


def batches(examples, tokenize, batch_size: int, regression: bool,
            shuffle=True, seed=0, drop_last=True) -> Iterator[dict]:
    idx = np.arange(len(examples))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for s in range(0, len(idx) - (batch_size - 1 if drop_last else 0),
                   batch_size):
        chunk = [examples[i] for i in idx[s:s + batch_size]]
        if len(chunk) < batch_size and drop_last:
            break
        ids, atts = tokenize(chunk)
        labels = np.asarray([c[2] for c in chunk],
                            np.float32 if regression else np.int32)
        yield dict(text_ids=ids, text_atts=atts, targets=labels)


def evaluate(ctx, model, params, examples, tokenize, task: str,
             batch_size: int):
    regression = task == "stsb"
    preds, labels = [], []

    @jax.jit
    def fwd(params, text_ids, text_atts):
        return model.apply({"params": params}, text_ids=text_ids,
                           text_atts=text_atts, train=False)

    for batch in batches(examples, tokenize, batch_size, regression,
                         shuffle=False, drop_last=False):
        logits = np.asarray(fwd(params, jnp.asarray(batch["text_ids"]),
                                jnp.asarray(batch["text_atts"])))
        if regression:
            preds.extend(logits.reshape(-1).tolist())
        else:
            preds.extend(logits.argmax(-1).tolist())
        labels.extend(np.asarray(batch["targets"]).tolist())
    return glue_metrics.compute(task, preds, labels)


def main(args, config: Optional[dict] = None):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    task = cfg["task_name"]
    num_labels = TASK_NUM_LABELS.get(task, cfg.get("num_labels", 2))
    regression = task == "stsb"

    from ..data.tokenization import build_tokenizer, SimpleTokenizer

    train_ex = load_glue_examples(cfg, "train")
    val_ex = load_glue_examples(cfg, "validation")
    try:
        tokenizer = build_tokenizer(cfg["text_encoder"])
    except Exception:
        print("### falling back to SimpleTokenizer (no local HF tokenizer)",
              flush=True)
        tokenizer = SimpleTokenizer.from_texts(
            [a + " " + (b or "") for a, b, _ in train_ex])
    tokenize = make_tokenize_fn(tokenizer, cfg.get("max_length", 128))

    mcfg = config_from_yaml(cfg)
    if hasattr(tokenizer, "vocab_size") and \
            tokenizer.vocab_size != mcfg.text.vocab_size:
        import dataclasses as dc

        text = dc.replace(mcfg.text, vocab_size=max(tokenizer.vocab_size,
                                                    16))
        mcfg = dc.replace(mcfg, text=text)
    model = XFMForClassification(mcfg, num_labels=num_labels,
                                 task_name="glue")

    bsz = cfg.get("per_device_train_batch_size", 32) * jax.device_count()
    steps_per_epoch = max(1, len(train_ex) // bsz)
    epochs = cfg.get("num_train_epochs", 3)
    # schedule horizon counts optimizer steps: one per accumulation group
    # (reference run_glue.py:314-318 num_update_steps_per_epoch)
    total = cfg.get("max_train_steps") or \
        epochs * opt_steps_per_epoch(cfg, steps_per_epoch)
    sched = linear_warmup_decay(float(cfg.get("learning_rate", 5e-5)), total,
                                cfg.get("num_warmup_steps", 0))

    # init needs only shapes — a real train batch here made `--evaluate` on a
    # train split smaller than one global batch crash before evaluating
    T = cfg.get("max_length", 128)

    def init_params():
        return model.init({"params": jax.random.PRNGKey(ctx.seed)},
                          text_ids=jnp.ones((2, T), jnp.int32),
                          text_atts=jnp.ones((2, T), jnp.int32),
                          method=XFMForClassification.init_all)["params"]

    from ..core.partitioning import param_shardings

    pshard = param_shardings(jax.eval_shape(init_params), ctx.mesh)
    with ctx.mesh:
        params = jax.jit(init_params, out_shardings=pshard)()

    if getattr(args, "checkpoint", None):
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        imported = import_xfm_checkpoint(sd, mcfg, head=None)
        params, missing, unexpected = merge_params(params, to_jax(imported))
        print(f"### loaded {args.checkpoint}: {len(missing)} missing, "
              f"{len(unexpected)} unexpected", flush=True)

    tx = create_optimizer(params, sched,
                          weight_decay=float(cfg.get("weight_decay", 0.0)),
                          lr_mult=1.0, clip_grad_norm=1.0)
    with ctx.mesh:
        opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, tx=tx)

    def loss_fn(params, batch, rng):
        loss = model.apply({"params": params}, text_ids=batch["text_ids"],
                           text_atts=batch["text_atts"],
                           targets=batch["targets"], train=True,
                           rngs={"dropout": rng}, deterministic=False)
        return loss, {}

    from .common import make_task_step

    # `gradient_accumulation_steps` (reference run_glue.py:314-360)
    step_fn, accum = make_task_step(ctx, loss_fn)
    rng = task_rng(ctx)

    best = -1e9
    if getattr(args, "evaluate", False):
        metrics = evaluate(ctx, model, state.params, val_ex, tokenize, task,
                           cfg.get("per_device_eval_batch_size", 8)
                           * jax.device_count())
        print("eval:", metrics, flush=True)
        return metrics

    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    metrics = {}
    for epoch in range(start_epoch, int(epochs)):
        loader = batches(train_ex, tokenize, bsz, regression,
                         seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   accum_steps=accum)
        metrics = evaluate(ctx, model, state.params, val_ex, tokenize, task,
                           cfg.get("per_device_eval_batch_size", 8)
                           * jax.device_count())
        append_log(ctx.out_dir, {"epoch": epoch, **stats, **metrics})
        if is_main_process():
            print(f"epoch {epoch}: {stats} {metrics}", flush=True)
        save_epoch_checkpoint(ctx, state, epoch)
        score = float(np.mean(list(metrics.values())))
        if score > best:
            best = score
            save_epoch_checkpoint(ctx, state, epoch, name="ckpt_best",
                                  keep=1)

    if task == "mnli":
        # Final mnli-mm evaluation on validation_mismatched
        # (reference run_glue.py:398-421).
        try:
            mm_ex = load_glue_examples(cfg, "validation_mismatched")
        except (KeyError, FileNotFoundError, OSError) as e:
            print(f"### mnli-mm eval skipped: {e}", flush=True)
            mm_ex = None
        if mm_ex:
            mm = evaluate(ctx, model, state.params, mm_ex, tokenize, task,
                          cfg.get("per_device_eval_batch_size", 8)
                          * jax.device_count())
            metrics.update({f"mm_{k}": v for k, v in mm.items()})
            append_log(ctx.out_dir, {"mnli_mm": mm})
            if is_main_process():
                print(f"mnli-mm: {mm}", flush=True)
    return metrics
