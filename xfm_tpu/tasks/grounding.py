"""Referring-expression grounding (reference Grounding_bbox.py,
Grounding_bbox_pretrain.py, Grounding.py).

- bbox mode: XFMForGrounding regression, eval = IoU≥0.5 accuracy over REFER
  splits (reference Grounding_bbox.py:115-212, dataset/utils.py:271-345).
- the weakly-supervised GradCAM mode of Grounding.py ranks detector boxes by
  cross-attention cam mass; provided via `attention_rollout` scoring.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.finetune_data import GroundingData
from ..data.transforms import TestTransform, TrainTransform
from ..models import XFMForGrounding, config_from_yaml
from ..models.losses import box_cxcywh_to_xyxy
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, :2], b[:, :2])
    rb = np.minimum(a[:, 2:], b[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    ua = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
          + (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) - inter)
    return inter / np.maximum(ua, 1e-6)


def evaluate(model, params, data: GroundingData):
    """IoU≥0.5 accuracy (reference dataset/utils.py:271-345 grounding_eval
    distilled to normalized coords)."""

    @jax.jit
    def fwd(params, images, ids, atts):
        return model.apply({"params": params}, images, ids, atts,
                           train=False)

    hits = total = 0
    for batch in data.epoch():
        coords = np.asarray(fwd(params, jnp.asarray(batch["images"]),
                                jnp.asarray(batch["text_ids"]),
                                jnp.asarray(batch["text_atts"])))
        pred = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(coords)))
        tgt = np.asarray(box_cxcywh_to_xyxy(
            jnp.asarray(batch["target_bbox"])))
        iou = iou_xyxy(pred, tgt)
        hits += int((iou >= 0.5).sum())
        total += len(iou)
    return {"iou50_acc": hits / max(total, 1)}


def main(args, config: Optional[dict] = None,
         from_orbax: Optional[str] = None):
    """Grounding_bbox fine-tune (reference Grounding_bbox.py). `from_orbax`
    overlays params from a stage-1 domain-pretrain Orbax checkpoint
    (reference --load_bbox_pretrain hand-off, run.py:311-318)."""
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 384)
    tokenizer = build_tokenizer_or_fallback(cfg)
    mcfg = _maybe_shrink_vocab(
        config_from_yaml(cfg, use_bbox_loss=True), tokenizer)
    model = XFMForGrounding(mcfg)

    mk = lambda ann, train: GroundingData(
        ann, TrainTransform(image_res, hflip=False) if train
        else TestTransform(image_res), cfg["image_root"], tokenizer,
        max_tokens=cfg.get("max_tokens", 30),
        batch_size=cfg.get("batch_size", 16), train=train)
    test_data = mk(cfg["test_file"], False)
    train_data = None if args.evaluate else mk(cfg["train_file"], True)

    T = cfg.get("max_tokens", 30)
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    steps = (max(1, len(train_data) // train_data.batch_size)
             if train_data else 1)
    state, sched = build_state(ctx, model, example, XFMForGrounding.init_all,
                               steps)
    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, _, _ = merge_params(state.params,
                                    to_jax(import_xfm_checkpoint(sd, mcfg)))
        state = state.replace(params=params)

    if from_orbax:
        from ..train.checkpoint import (load_params_from_checkpoint,
                                        merge_params)

        loaded = load_params_from_checkpoint(from_orbax)
        params, missing, _ = merge_params(state.params, loaded)
        state = state.replace(params=params)
        if is_main_process():
            print(f"### loaded domain-pretrain params from {from_orbax} "
                  f"({len(missing)} fresh)", flush=True)

    if args.evaluate:
        metrics = evaluate(model, state.params, test_data)
        print(metrics, flush=True)
        return metrics

    def loss_fn(params, batch, rng):
        lb, lg = model.apply({"params": params}, batch["images"],
                             batch["text_ids"], batch["text_atts"],
                             target_bbox=batch["target_bbox"], train=True,
                             deterministic=False, rngs={"dropout": rng})
        return lb + lg, {"loss_bbox": lb, "loss_giou": lg}

    step_fn = make_train_step(loss_fn)
    rng = task_rng(ctx)
    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    best = 0.0
    for epoch in range(start_epoch,
                       int(cfg.get("schedular", {}).get("epochs", 10))):
        loader = train_data.epoch(epoch_seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched)
        metrics = evaluate(model, state.params, test_data)
        append_log(ctx.out_dir, {"epoch": epoch, **stats, **metrics})
        if is_main_process():
            print(f"epoch {epoch}: {metrics}", flush=True)
        save_epoch_checkpoint(ctx, state, epoch)
        if metrics["iou50_acc"] > best:
            best = metrics["iou50_acc"]
            save_epoch_checkpoint(ctx, state, epoch, name="ckpt_best",
                                  keep=1)
    return {"best_iou50": best}


def main_bbox_pipeline(args, config: Optional[dict] = None):
    """refcoco_bbox two-stage pipeline (reference run.py:311-318):
    stage 1 = region-stream domain pretrain with itc/itm/mlm/bbox/giou
    (reference Grounding_bbox_pretrain.py:181-207; here it reuses the
    pretrain task on the region stream), stage 2 = bbox fine-tune seeded
    from the stage-1 checkpoint. With --load_ckpt_from pointing at a
    domain-pretrained Orbax checkpoint dir only the fine-tune stage runs;
    --evaluate also skips stage 1.

    The stage-1 config is resolved from the fine-tune YAML's
    `domain_pretrain_config` key, else a sibling
    `Grounding_bbox_pretrain.yaml`."""
    import copy as _copy
    import os as _os

    from_orbax = getattr(args, "load_ckpt_from", None)
    if not args.evaluate and not from_orbax:
        from ..core.config import load_yaml

        cfg0 = load_yaml(args.config)
        dp_cfg = cfg0.get("domain_pretrain_config")
        if dp_cfg and not _os.path.isabs(dp_cfg):
            dp_cfg = _os.path.join(_os.path.dirname(args.config), dp_cfg)
        if not dp_cfg:
            cand = _os.path.join(_os.path.dirname(args.config),
                                 "Grounding_bbox_pretrain.yaml")
            dp_cfg = cand if _os.path.exists(cand) else None
        if dp_cfg and _os.path.exists(dp_cfg):
            from . import pretrain

            a2 = _copy.copy(args)
            a2.config = dp_cfg
            a2.output_dir = _os.path.join(args.output_dir, "bbox_pretrain")
            if is_main_process():
                print(f"### refcoco_bbox stage 1: domain pretrain "
                      f"({dp_cfg})", flush=True)
            pretrain.main(a2)
            from_orbax = _os.path.join(a2.output_dir, "ckpt")
            args = _copy.copy(args)
            args.checkpoint = None  # stage-2 starts from stage-1 params
        elif is_main_process():
            print("### refcoco_bbox: no domain-pretrain config found, "
                  "running fine-tune only", flush=True)
    return main(args, config, from_orbax=from_orbax)


def main_weakly_supervised(args, config: Optional[dict] = None):
    """Weakly-supervised grounding via GradCAM (reference Grounding.py):
    rank candidate detector boxes by cross-attention cam mass at fusion
    layer `block_num`. Annotations carry per-sample candidate boxes
    ({"image", "text", "boxes": [[x0,y0,x1,y1],...], "gt": idx})."""
    import json as _json

    from ..models import XFMForRetrieval, config_from_yaml
    from ..models.gradcam import itm_gradcam, rank_boxes_by_cam

    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 384)
    tokenizer = build_tokenizer_or_fallback(cfg)
    mcfg = _maybe_shrink_vocab(
        config_from_yaml(cfg, use_contrastive_loss=True,
                         use_matching_loss=True), tokenizer)
    model = XFMForRetrieval(mcfg)
    data = GroundingData(cfg["test_file"], TestTransform(image_res),
                         cfg["image_root"], tokenizer,
                         max_tokens=cfg.get("max_tokens", 30),
                         batch_size=cfg.get("batch_size", 8), train=False)
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, cfg.get("max_tokens", 30)),
                                     jnp.int32),
                   text_atts=jnp.ones((2, cfg.get("max_tokens", 30)),
                                      jnp.int32))
    state, _ = build_state(ctx, model, example, XFMForRetrieval.init_all, 1)
    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, _, _ = merge_params(state.params,
                                    to_jax(import_xfm_checkpoint(sd, mcfg)))
        state = state.replace(params=params)

    block_num = cfg.get("block_num", 8)
    ann = data.ann
    hits = total = 0
    bi = 0
    for batch in data.epoch():
        cam = itm_gradcam(model, state.params,
                          jnp.asarray(batch["images"]),
                          jnp.asarray(batch["text_ids"]),
                          jnp.asarray(batch["text_atts"]),
                          block_num=block_num)
        for j in range(batch["images"].shape[0]):
            a = ann[bi]
            bi += 1
            boxes = a.get("boxes")
            if not boxes:
                continue
            scores = rank_boxes_by_cam(cam[j], boxes, image_res,
                                       cfg.get("patch_size", 16))
            if int(np.argmax(scores)) == int(a.get("gt", 0)):
                hits += 1
            total += 1
    acc = hits / max(total, 1)
    append_log(ctx.out_dir, {"gradcam_acc": acc})
    if is_main_process():
        print({"gradcam_acc": acc}, flush=True)
    return {"gradcam_acc": acc}
