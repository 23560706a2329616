"""ImageNet / linear-probe classification (reference Imagenet.py).

Covers: fine-tune (deep-MLP head over [cls ‖ mean-patch], mixup/cutmix +
soft-target CE, per-iter half-cosine LR — reference Imagenet.py:241-257,
592-611) and linear probe (frozen backbone + LARS — reference
Imagenet.py:567-574). Data comes from an image-folder tree or a jsonl
manifest ({"image": path, "label": int}).
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.timm_aug import ImagenetEvalTransform
from ..data.transforms import decode_image
from ..models import XFMForClassification, config_from_yaml
from ..train.metrics import is_main_process
from ..train.optim import create_optimizer, lars
from ..train.schedules import half_cosine
from ..train.train_state import TrainState, make_train_step
from .common import task_rng, TaskContext, append_log, train_epoch


def load_manifest(path_or_dir: str):
    """jsonl manifest or torchvision-style class-folder tree →
    list[(path, label)] + num_labels."""
    if os.path.isfile(path_or_dir):
        rows = []
        with open(path_or_dir) as f:
            for line in f:
                d = json.loads(line)
                rows.append((d["image"], int(d["label"])))
        return rows, 1 + max(l for _, l in rows)
    classes = sorted(d for d in os.listdir(path_or_dir)
                     if os.path.isdir(os.path.join(path_or_dir, d)))
    rows = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(path_or_dir, c)
        for fn in sorted(os.listdir(cdir)):
            rows.append((os.path.join(cdir, fn), ci))
    return rows, len(classes)


def mixup_cutmix(rng: np.random.Generator, images, labels, num_labels,
                 mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                 switch_prob=0.5, cutmix_minmax=None,
                 label_smoothing=0.1):
    """Host-side Mixup/CutMix → soft targets
    (reference Imagenet.py:592-611 via timm Mixup; 'batch' mode — one lam
    per batch, cutmix chosen with `switch_prob`, bbox from `cutmix_minmax`
    area-ratio bounds when given, else from Beta(cutmix_alpha))."""
    B = images.shape[0]
    onehot = np.full((B, num_labels), label_smoothing / num_labels,
                     np.float32)
    onehot[np.arange(B), labels] += 1.0 - label_smoothing
    if rng.random() > prob:
        return images, onehot
    perm = rng.permutation(B)
    cutmix_on = cutmix_alpha > 0 or cutmix_minmax is not None
    if not (mixup_alpha > 0 or cutmix_on):
        return images, onehot
    # timm Mixup._mix_batch: switch only when both modes are enabled
    use_cutmix = cutmix_on and (mixup_alpha <= 0
                                or rng.random() < switch_prob)
    if not use_cutmix:
        lam = rng.beta(mixup_alpha, mixup_alpha)
        images = lam * images + (1 - lam) * images[perm]
    else:
        H, W = images.shape[1:3]
        if cutmix_minmax:
            # timm rand_bbox_minmax: per-dimension side ratios drawn
            # uniformly in the bounds (NOT a uniform area ratio)
            rh = int(rng.uniform(cutmix_minmax[0] * H, cutmix_minmax[1] * H))
            rw = int(rng.uniform(cutmix_minmax[0] * W, cutmix_minmax[1] * W))
        else:
            lam = rng.beta(cutmix_alpha, cutmix_alpha)
            rh, rw = int(H * np.sqrt(1 - lam)), int(W * np.sqrt(1 - lam))
        cy, cx = rng.integers(0, H), rng.integers(0, W)
        y0, y1 = np.clip(cy - rh // 2, 0, H), np.clip(cy + rh // 2, 0, H)
        x0, x1 = np.clip(cx - rw // 2, 0, W), np.clip(cx + rw // 2, 0, W)
        images = images.copy()
        images[:, y0:y1, x0:x1] = images[perm, y0:y1, x0:x1]
        lam = 1 - (y1 - y0) * (x1 - x0) / (H * W)
    targets = lam * onehot + (1 - lam) * onehot[perm]
    return images, targets


def batches(rows, transform, image_root, batch_size, shuffle=True, seed=0,
            drop_last=True) -> Iterator[dict]:
    idx = np.arange(len(rows))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    buf_i, buf_l = [], []
    for i in idx:
        path, label = rows[int(i)]
        if isinstance(path, str) and image_root and not os.path.isabs(path):
            path = os.path.join(image_root, path)
        try:
            buf_i.append(transform(decode_image(path)))
            buf_l.append(label)
        except Exception:
            continue
        if len(buf_i) == batch_size:
            yield dict(images=np.stack(buf_i),
                       targets=np.asarray(buf_l, np.int64))
            buf_i, buf_l = [], []
    if buf_i and not drop_last:
        yield dict(images=np.stack(buf_i),
                   targets=np.asarray(buf_l, np.int64))


def soft_ce(logits, soft_targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def evaluate(model, params, rows, transform, image_root, batch_size,
             fwd_fn=None):
    """fwd_fn overrides the model forward (the pipelined vision path);
    remainder eval batches are zero-padded to batch_size for it (the
    pipeline needs a fixed microbatch split) and the padded rows sliced
    away."""
    if fwd_fn is None:
        @jax.jit
        def fwd(params, images):
            return model.apply({"params": params}, images=images,
                               train=False)
    else:
        fwd = jax.jit(fwd_fn)

    correct = total = 0
    for batch in batches(rows, transform, image_root, batch_size,
                         shuffle=False, drop_last=False):
        imgs = batch["images"]
        n = len(batch["targets"])
        if fwd_fn is not None and n < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n,) + imgs.shape[1:],
                                imgs.dtype)])
        pred = np.asarray(fwd(params, jnp.asarray(imgs)))[:n]
        correct += int((pred.argmax(-1) == batch["targets"]).sum())
        total += n
    return {"acc1": correct / max(total, 1)}


def main(args, config: Optional[dict] = None):
    # this task consumes parallel.pipe: the vision block stack (the one
    # shipped tower deep enough for it — beit2-large, 24 blocks) stages
    # over the pipe mesh axis via core.pipeline.pipelined_beit_forward
    ctx = TaskContext.from_args(args, allow_pipe=True)
    cfg = ctx.config
    image_res = cfg.get("image_res", 224)
    is_lp = bool(cfg.get("is_lp", False))
    pipe = int((cfg.get("parallel", {}) or {}).get("pipe", 1) or 1)

    if cfg.get("dataset"):
        # Named probe dataset (reference Imagenet.py:43-177 DATASETS
        # registry incl. the FER2013 h5 loader).
        from ..data.probe_datasets import PROBE_DATASETS, load_probe_split

        name = cfg["dataset"]
        root = cfg.get("data_root", cfg.get("train_root", "."))
        spec = PROBE_DATASETS[name.lower()]
        train_rows, n1 = load_probe_split(
            name, root, cfg.get("train_split", spec.train_split))
        val_rows, n2 = load_probe_split(
            name, root, cfg.get("val_split", spec.val_split))
    else:
        train_rows, n1 = load_manifest(cfg["train_root"])
        val_rows, n2 = load_manifest(cfg["val_root"])
    num_labels = cfg.get("num_labels", max(n1, n2))

    mcfg = config_from_yaml(cfg)
    model = XFMForClassification(mcfg, num_labels=num_labels,
                                 task_name="imagenet", is_lp=is_lp)

    pipelined_fwd = None
    if pipe > 1:
        # GPipe-staged BEiT block stack (core/pipeline.py): stage params
        # live one-per-device along the pipe axis, microbatches stream
        # through with ppermute; patch-embed and the [avgpool ‖ patches]
        # readout + DeepMLP head run replicated. The staged blocks run
        # deterministic, so train-mode stochastic depth/dropout is only
        # valid when those rates are 0 (or the backbone is frozen: is_lp).
        from ..core.pipeline import pipelined_beit_forward
        from ..models.task_models import DeepMLPHead

        vcfg = mcfg.vision
        if not (is_lp or (vcfg.drop_path_rate == 0
                          and vcfg.drop_rate == 0
                          and vcfg.attn_drop_rate == 0)):
            raise NotImplementedError(
                "parallel.pipe > 1 trains the staged vision blocks "
                "deterministically: set drop_path_rate/dropout to 0 in the "
                "vision config, or use is_lp (frozen backbone)")
        micro = int((cfg.get("parallel", {}) or {}).get(
            "microbatches", 2 * pipe))
        data_axes = tuple(
            a for a in ("data", "fsdp")
            if dict(zip(ctx.mesh.axis_names, ctx.mesh.devices.shape))
            .get(a, 1) > 1)
        head = DeepMLPHead(num_labels, dtype=vcfg.dtype)

        def pipelined_fwd(params, images):
            with ctx.mesh:
                emb = pipelined_beit_forward(
                    params["backbone"]["vision_encoder"], vcfg, images,
                    ctx.mesh, num_microbatches=micro, data_axes=data_axes)
            if is_lp:
                emb = jax.lax.stop_gradient(emb)
            feats = jnp.concatenate(
                [emb[:, 0, :], jnp.mean(emb[:, 1:, :], axis=1)], axis=-1)
            return head.apply({"params": params["cls_head"]}, feats)

    bsz = cfg.get("batch_size", 64)
    steps_per_epoch = max(1, len(train_rows) // bsz)
    epochs = int(cfg.get("schedular", {}).get("epochs",
                                              cfg.get("epochs", 30)))
    opt = cfg.get("optimizer", {}) or {}
    sched = half_cosine(opt.get("lr", 1e-3), opt.get("min_lr", 1e-6),
                        epochs, cfg.get("warmup_epochs", 5),
                        steps_per_epoch)

    example = dict(images=jnp.zeros((2, image_res, image_res, 3)))

    def init_params():
        return model.init({"params": jax.random.PRNGKey(ctx.seed)},
                          images=example["images"],
                          method=XFMForClassification.init_all)["params"]

    from ..core.partitioning import param_shardings

    pshard = param_shardings(jax.eval_shape(init_params), ctx.mesh)
    with ctx.mesh:
        params = jax.jit(init_params, out_shardings=pshard)()

    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, missing, _ = merge_params(
            params, to_jax(import_xfm_checkpoint(sd, mcfg)))

    if is_lp and str(opt.get("opt", "")).lower() == "lars":
        tx = lars(sched, weight_decay=opt.get("weight_decay", 0.0))
    else:
        tx = create_optimizer(params, sched,
                              weight_decay=opt.get("weight_decay", 0.05),
                              lr_mult=opt.get("lr_mult", 1.0))
    with ctx.mesh:
        opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, tx=tx)

    if args.evaluate:
        metrics = evaluate(model, state.params, val_rows,
                           ImagenetEvalTransform(image_res),
                           cfg.get("image_root"), bsz,
                           fwd_fn=pipelined_fwd)
        print(metrics, flush=True)
        return metrics

    # timm Mixup activates when ANY of mixup/cutmix/cutmix_minmax is set
    # (reference Imagenet.py:592-611 mixup_active)
    use_mix = not is_lp and (cfg.get("mixup", 0.8) > 0
                             or cfg.get("cutmix", 1.0) > 0
                             or cfg.get("cutmix_minmax") is not None)
    if cfg.get("mixup_mode", "batch") != "batch":
        raise NotImplementedError(
            "mixup_mode 'pair'/'elem' not implemented; the reference config "
            "uses 'batch' (configs/xfm-ft/imagenet1k.yaml:38)")

    if pipelined_fwd is not None and bsz % int(
            (cfg.get("parallel", {}) or {}).get("microbatches", 2 * pipe)):
        raise ValueError("batch_size must divide into pipeline microbatches")

    def loss_fn(params, batch, rng):
        if pipelined_fwd is not None:
            logits = pipelined_fwd(params, batch["images"])
            if use_mix:
                return soft_ce(logits, batch["targets"]), {}
            from ..models.text_encoder import cross_entropy

            return cross_entropy(logits, batch["targets"]), {}
        if use_mix:
            logits = model.apply({"params": params},
                                 images=batch["images"], train=False,
                                 deterministic=False,
                                 rngs={"dropout": rng})
            return soft_ce(logits, batch["targets"]), {}
        loss = model.apply({"params": params}, images=batch["images"],
                           targets=batch["targets"], train=True,
                           deterministic=False, rngs={"dropout": rng})
        return loss, {}

    step_fn = make_train_step(loss_fn)
    rng = task_rng(ctx)
    host_rng = np.random.default_rng(ctx.seed)
    # reference Imagenet.py:260-278 timm create_transform recipe
    from ..data.timm_aug import ImagenetTrainTransform

    ttf = ImagenetTrainTransform(
        image_res, aa=cfg.get("aa", "rand-m9-mstd0.5-inc1"),
        color_jitter=cfg.get("color_jitter"),
        reprob=cfg.get("reprob", 0.25), remode=cfg.get("remode", "pixel"),
        recount=cfg.get("recount", 1), seed=ctx.seed)
    best = 0.0
    for epoch in range(epochs):
        def loader():
            for b in batches(train_rows, ttf, cfg.get("image_root"), bsz,
                             seed=ctx.seed + epoch):
                if use_mix:
                    imgs, tgts = mixup_cutmix(
                        host_rng, b["images"], b["targets"], num_labels,
                        mixup_alpha=cfg.get("mixup", 0.8),
                        cutmix_alpha=cfg.get("cutmix", 1.0),
                        prob=cfg.get("mixup_prob", 1.0),
                        switch_prob=cfg.get("mixup_switch_prob", 0.5),
                        cutmix_minmax=cfg.get("cutmix_minmax"),
                        label_smoothing=cfg.get(
                            "smoothing", cfg.get("label_smoothing", 0.1)))
                    yield dict(images=imgs, targets=tgts)
                else:
                    yield b

        state, stats = train_epoch(ctx, state, step_fn, loader(), rng,
                                   epoch, sched)
        metrics = evaluate(model, state.params, val_rows,
                           ImagenetEvalTransform(image_res),
                           cfg.get("image_root"), bsz,
                           fwd_fn=pipelined_fwd)
        append_log(ctx.out_dir, {"epoch": epoch, **stats, **metrics})
        if is_main_process():
            print(f"epoch {epoch}: {metrics}", flush=True)
        if metrics["acc1"] > best:
            best = metrics["acc1"]
            from ..train.checkpoint import save_checkpoint

            save_checkpoint(os.path.join(ctx.out_dir, "ckpt"), state,
                            step=epoch)
    return {"best_acc1": best}
