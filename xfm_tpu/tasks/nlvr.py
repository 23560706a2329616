"""NLVR2 fine-tuning (reference NLVR.py): two-image reasoning, plain CE
train / accuracy eval."""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.finetune_data import NLVRData
from ..data.transforms import TestTransform, TrainTransform
from ..models import XFMForNLVR, config_from_yaml
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab


def evaluate(model, params, data: NLVRData):
    @jax.jit
    def fwd(params, images, ids, atts):
        return model.apply({"params": params}, images, ids, atts,
                           train=False)

    correct = total = 0
    for batch in data.epoch():
        pred = np.asarray(fwd(params, jnp.asarray(batch["images"]),
                              jnp.asarray(batch["text_ids"]),
                              jnp.asarray(batch["text_atts"])))
        correct += int((pred.argmax(-1) == batch["targets"]).sum())
        total += len(batch["targets"])
    return {"acc": correct / max(total, 1)}


def main(args, config: Optional[dict] = None):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 384)
    tokenizer = build_tokenizer_or_fallback(cfg)
    mcfg = _maybe_shrink_vocab(config_from_yaml(cfg), tokenizer)
    model = XFMForNLVR(mcfg)

    mk = lambda ann, train: NLVRData(
        ann, (TrainTransform(image_res) if train
              else TestTransform(image_res)), cfg["image_root"], tokenizer,
        max_tokens=cfg.get("max_tokens", 40),
        batch_size=cfg.get("batch_size", 16), train=train)
    test_data = mk(cfg["test_file"], False)
    train_data = None if args.evaluate else mk(cfg["train_file"], True)
    val_data = mk(cfg["val_file"], False) if cfg.get("val_file") else test_data

    T = cfg.get("max_tokens", 40)
    example = dict(images=jnp.zeros((4, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    steps_per_epoch = (max(1, len(train_data) // train_data.batch_size)
                       if train_data else 1)
    state, sched = build_state(ctx, model, example, XFMForNLVR.init_all,
                               steps_per_epoch)

    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, missing, _ = merge_params(state.params,
                                          to_jax(import_xfm_checkpoint(
                                              sd, mcfg, head="cls_mlp")))
        state = state.replace(params=params)

    if args.evaluate:
        metrics = evaluate(model, state.params, test_data)
        print(metrics, flush=True)
        return metrics

    def loss_fn(params, batch, rng):
        loss = model.apply({"params": params}, batch["images"],
                           batch["text_ids"], batch["text_atts"],
                           targets=batch["targets"], train=True,
                           deterministic=False, rngs={"dropout": rng})
        return loss, {}

    # accumulate_steps (reference NLVR.py:46-57)
    from .common import make_task_step

    step_fn, accum = make_task_step(ctx, loss_fn)
    rng = task_rng(ctx)
    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    best = 0.0
    for epoch in range(start_epoch,
                       int(cfg.get("schedular", {}).get("epochs", 10))):
        loader = train_data.epoch(epoch_seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched, accum_steps=accum)
        val = evaluate(model, state.params, val_data)
        test = evaluate(model, state.params, test_data)
        append_log(ctx.out_dir, {"epoch": epoch, **stats,
                                 "val_acc": val["acc"],
                                 "test_acc": test["acc"]})
        if is_main_process():
            print(f"epoch {epoch}: val {val['acc']:.4f} "
                  f"test {test['acc']:.4f}", flush=True)
        save_epoch_checkpoint(ctx, state, epoch)
        if val["acc"] > best:
            best = val["acc"]
            save_epoch_checkpoint(ctx, state, epoch, name="ckpt_best",
                                  keep=1)
    return {"best_val_acc": best}
