"""Multi-stream multimodal pretraining (reference Pretrain.py).

Reference semantics: each global step consumes one batch per active stream
(text / region / web / aux / imagenet / image), runs fwd/bwd per stream with
apex delayed all-reduce, then ONE optimizer step
(reference Pretrain.py:141-247; the text stream additionally takes its own
step at Pretrain.py:127-133). TPU redesign: one jitted train step whose loss
is the weighted sum of all active streams' losses — gradient-equivalent to
accumulate-then-step — with the text stream either folded in (default) or
stepped separately (`text_step_separate: true` keeps the reference's exact
update order).

Staged loss schedule (`stop_calc_{itm,mlm,itc,mim,mm}` step thresholds,
reference Pretrain.py:160-243) switches static flags at stage boundaries —
one recompile per stage, not per step.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pretrain_data import ImageStream, ImageTextStream, TextStream
from ..data.transforms import TrainTransform
from ..models import XFMForPretrain, config_from_yaml
from ..train.metrics import MetricLogger, is_main_process
from ..train.train_state import make_multi_train_step, make_train_step
from .common import task_rng, TaskContext, append_log, build_state
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab

LOSS_KEYS = ("loss_itc", "loss_itm", "loss_mlm", "loss_mim", "loss_bbox",
             "loss_giou")


def build_streams(cfg, tokenizer, rank=0, world_size=1):
    """Instantiate the up-to-6 streams present in the config
    (reference dataset/__init__.py:70-109)."""
    streams = {}
    transform = TrainTransform(cfg.get("image_res", 224), scale=(0.2, 1.0))
    if cfg.get("train_file"):
        streams["image"] = ImageTextStream(cfg["train_file"], cfg, tokenizer,
                                           transform, rank, world_size)
    if cfg.get("train_file_web"):
        streams["web"] = ImageTextStream(cfg["train_file_web"], cfg,
                                         tokenizer, transform, rank,
                                         world_size, config_key="images_web"
                                         if cfg.get("images_web") else
                                         "images")
    if cfg.get("train_file_aux"):
        streams["aux"] = ImageTextStream(cfg["train_file_aux"], cfg,
                                         tokenizer, transform, rank,
                                         world_size, is_aux=True)
    if cfg.get("train_file_text"):
        streams["text"] = TextStream(cfg["train_file_text"], cfg, tokenizer,
                                     rank, world_size)
    if cfg.get("train_file_imagenet"):
        streams["imagenet"] = ImageStream(cfg["train_file_imagenet"], cfg,
                                          transform, rank, world_size)
    if cfg.get("train_file_regions"):
        from ..data.pretrain_data import RegionTextStream

        streams["region"] = RegionTextStream(cfg["train_file_regions"], cfg,
                                             tokenizer, rank, world_size)
    return streams


def stream_flags(name: str, step: int, cfg) -> dict:
    """Per-stream static loss flags incl. the staged schedule
    (reference Pretrain.py:160-243)."""
    stop = {k: cfg.get(f"stop_calc_{k}", None)
            for k in ("itm", "mlm", "itc", "mim", "mm")}

    def on(key, default=True):
        th = stop.get(key)
        if th is not None and step >= th:
            return False
        return default

    if name == "text":
        return {}
    if name == "imagenet":
        return dict(ret_itc=False, ret_match=False, ret_mlm=False,
                    ret_mim=on("mim"), data_source="imagenet")
    base = dict(ret_itc=on("itc"), ret_match=on("itm"), ret_mlm=on("mlm"),
                ret_mim=on("mim") and cfg.get("use_mm_mim_loss", True),
                data_source=name)
    if name == "aux":
        base.update(ret_itc=False, ret_match=False, ret_mim=False)
    if name == "region":
        base.update(ret_mim=False,
                    ret_bbox=cfg.get("ret_bbox_loss", True),
                    ret_bbox_giou=cfg.get("ret_bbox_giou", True))
    return base


def main(args, config: Optional[dict] = None):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    tokenizer = build_tokenizer_or_fallback(cfg)
    mcfg = _maybe_shrink_vocab(
        config_from_yaml(cfg, use_contrastive_loss=True,
                         use_matching_loss=True, use_mlm_loss=True,
                         use_bbox_loss=True),
        tokenizer)
    model = XFMForPretrain(mcfg)

    # Frozen VQ-KD tokenizer for discrete-target MIM
    # (`use_vision_tokenizer: true` + `tokenizer_model` [+ `tokenizer_weight`
    # torch checkpoint]; reference models/xfm.py:104-112,488-496,625-629).
    code_ids_fn = None
    if cfg.get("use_vision_tokenizer", False):
        from ..models.vqkd import VQKD, vqkd_config_from_yaml

        vq_cfg = vqkd_config_from_yaml(cfg)
        vq_model = VQKD(vq_cfg)
        res = cfg.get("image_res", 224)
        vq_vars = vq_model.init(
            {"params": jax.random.PRNGKey(7)},
            jnp.zeros((1, res, res, 3), jnp.float32),
            method=VQKD.get_codebook_indices)
        if cfg.get("tokenizer_weight"):
            from ..train.checkpoint import (import_vqkd_checkpoint,
                                            load_torch_state_dict,
                                            merge_params, to_jax)

            vsd = load_torch_state_dict(cfg["tokenizer_weight"])
            imported = to_jax(import_vqkd_checkpoint(vsd, vq_cfg))
            vq_params, _, _ = merge_params(dict(vq_vars["params"]),
                                           imported["params"])
            vq_vars = {"params": vq_params,
                       "vq_stats": to_jax(imported["vq_stats"])}
        vq_vars = jax.tree.map(jax.lax.stop_gradient, vq_vars)

        def code_ids_fn(images):
            return vq_model.apply(vq_vars, images,
                                  method=VQKD.get_codebook_indices)

    rank, ws = jax.process_index(), jax.process_count()
    streams = build_streams(cfg, tokenizer, rank, ws)
    assert streams, "no pretraining streams configured"
    weights = {s: cfg.get(f"w{s}", 1.0) for s in streams}

    image_res = cfg.get("image_res", 224)
    T = cfg.get("max_tokens", 30)
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    steps_per_epoch = max(1, cfg.get("train_dataset_size", 10000)
                          // max(1, cfg.get("images", {}).get("batch_size",
                                                              32) * ws))
    state, sched = build_state(
        ctx, model, example, XFMForPretrain.init_all, steps_per_epoch,
        init_rngs={"params": jax.random.PRNGKey(ctx.seed)})

    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        params, missing, _ = merge_params(state.params,
                                          to_jax(import_xfm_checkpoint(
                                              sd, mcfg)))
        state = state.replace(params=params)

    from .common import maybe_bf16_params

    state = maybe_bf16_params(ctx, state, sched)

    if cfg.get("resume", False):
        # preemption-safe resume: restores params/opt/step from the latest
        # Orbax checkpoint (reference Pretrain.py:438-445 semantics)
        from ..train.checkpoint import restore_checkpoint

        state = restore_checkpoint(os.path.join(ctx.out_dir, "ckpt"), state)
        if is_main_process():
            print(f"### resumed at step {int(state.step)}", flush=True)

    # `text_step_separate: true` replays the reference's exact update order:
    # the text-MLM stream runs fwd/bwd and takes ITS OWN optimizer step
    # before the combined multimodal step (reference Pretrain.py:127-133,
    # 221). Default (False) folds the text loss into the one combined step —
    # gradient-equivalent modulo optimizer-state interleaving.
    text_separate = bool(cfg.get("text_step_separate", False)) \
        and "text" in streams

    # K optimizer steps per dispatch (`dispatch_steps` YAML key): batches are
    # stacked [K, B, ...] and stepped inside one donated jitted lax.scan —
    # this is what makes `run.py --task pretrain_DIY` hit the same samples/s
    # as bench.py (per-dispatch host/tunnel overhead amortized; PERF.md).
    K = max(1, int(cfg.get("dispatch_steps", 1)))

    def make_text_step():
        def loss_fn(params, batch, rng):
            out = model.apply({"params": params}, deterministic=False,
                              rngs={"hardneg": jax.random.fold_in(rng, 0),
                                    "dropout": jax.random.fold_in(rng, 1)},
                              **batch)
            loss = weights.get("text", 1.0) * sum(out[k] for k in LOSS_KEYS)
            return loss, {f"text_{k}": out[k] for k in LOSS_KEYS}

        return (make_train_step(loss_fn) if K == 1
                else make_multi_train_step(loss_fn, K))

    # Streams that emit un-augmented uint8 (native decode + device RandAugment
    # split; data/device_aug.py): the jitted step applies the batched op
    # rounds on device, where they fuse into the input normalize.
    aug_streams = {name for name, s in streams.items()
                   if getattr(s, "device_randaug_active", False)}

    def make_step(flags_by_stream):
        def loss_fn(params, batches, rng):
            from ..data.device_aug import randaugment_batch

            total = 0.0
            aux = {}
            for i, (name, batch) in enumerate(sorted(batches.items())):
                flags = flags_by_stream[name]
                extra = {}
                if (name in aug_streams and batch.get("images") is not None
                        and jnp.issubdtype(batch["images"].dtype,
                                           jnp.integer)):
                    batch = dict(batch)
                    batch["images"] = randaugment_batch(
                        jax.random.fold_in(rng, 1000 + i), batch["images"])
                if (name == "region" and batch.get("is_image") is not None
                        and cfg.get("calc_image_bbox_loss", False)):
                    # calc_image_bbox_loss: whole-image rows count in the
                    # bbox loss too (reference Pretrain.py:101-102 sets
                    # is_image=None)
                    batch = dict(batch)
                    batch["is_image"] = None
                if (code_ids_fn is not None and flags.get("ret_mim")
                        and batch.get("images") is not None):
                    # frozen-tokenizer code ids of the unmasked images
                    # (reference models/xfm.py:625-627 computes them
                    # under no_grad inside get_mim_loss)
                    extra["vqkd_code_ids"] = jax.lax.stop_gradient(
                        code_ids_fn(batch["images"]))
                out = model.apply(
                    {"params": params}, deterministic=False,
                    rngs={"hardneg": jax.random.fold_in(rng, 2 * i),
                          "dropout": jax.random.fold_in(rng, 2 * i + 1)},
                    **batch, **flags, **extra)
                w = weights.get(name, 1.0)
                stream_loss = sum(out[k] for k in LOSS_KEYS)
                total = total + w * stream_loss
                for k in LOSS_KEYS:
                    aux[f"{name}_{k}"] = out[k]
            return total, aux

        return (make_train_step(loss_fn) if K == 1
                else make_multi_train_step(loss_fn, K))

    epochs = int(cfg.get("schedular", {}).get("epochs", 1))
    max_steps = int(cfg.get("max_steps", epochs * steps_per_epoch))
    ckpt_step = cfg.get("ckpt_frequent_step", 50000)

    from ..data.prefetch import Prefetcher

    iters = {name: iter(Prefetcher(s, depth=2))
             for name, s in streams.items()}
    logger = MetricLogger()
    rng = task_rng(ctx)
    step_fn = None
    text_step_fn = make_text_step() if text_separate else None
    flags_sig = None
    t0 = time.time()

    def next_batches():
        batches = {}
        for name, it in iters.items():
            b = dict(next(it))
            if name == "text":
                b["images"] = None
            batches[name] = b
        return batches

    # Throughput accounting: wall time per dispatch after the compile
    # dispatches, in image-stream samples/s/process (comparable to bench.py).
    bs_main = (cfg.get("images", {}) or {}).get("batch_size", 32)
    perf = {"samples": 0, "secs": 0.0, "input_secs": 0.0, "dispatches": 0}

    # Double buffering: collate + H2D transfer run one dispatch ahead on a
    # daemon thread (data/prefetch.device_batches) so they overlap the
    # device step instead of sitting on the dispatch critical path.
    from ..data.prefetch import device_batches

    def host_batches():
        while True:
            if K == 1:
                yield next_batches()
            else:
                group = [next_batches() for _ in range(K)]
                yield jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]), *group)

    batch_iter_dev = device_batches(host_batches(), ctx.mesh,
                                    batch_axis=0 if K == 1 else 1)
    batch_source = iter(batch_iter_dev)

    step = int(state.step)
    while step < max_steps:
        flags = {name: stream_flags(name, step, cfg) for name in streams
                 if not (text_separate and name == "text")}
        sig = str(sorted(flags.items()))
        if sig != flags_sig:  # stage boundary → rebuild jitted step
            step_fn = make_step(flags)
            flags_sig = sig

        # the dispatch timer includes the input wait (next() blocks when the
        # host pipeline is the bottleneck) so the printed throughput is the
        # sustained end-to-end rate, not device-only
        t_dispatch = time.perf_counter()
        batches = next(batch_source)
        t_input = time.perf_counter() - t_dispatch
        rng, sub = jax.random.split(rng)
        metrics = {}
        with ctx.mesh:
            if text_separate:
                rng, tsub = jax.random.split(rng)
                state, tmetrics = text_step_fn(state, batches.pop("text"),
                                               tsub)
                metrics.update(tmetrics)
            state, smetrics = step_fn(state, batches, sub)
            metrics.update(smetrics)
        # ONE device_get RPC for all scalars (forces step completion); N
        # separate float() fetches cost N x the tunnel RTT per dispatch
        host_metrics = jax.device_get(
            {k: v for k, v in metrics.items() if jnp.ndim(v) == 0})
        logger.update(**{k: float(v) for k, v in host_metrics.items()})
        perf["dispatches"] += 1
        if perf["dispatches"] > 2:  # skip compile + first steady dispatch
            perf["secs"] += time.perf_counter() - t_dispatch
            perf["input_secs"] += t_input
            perf["samples"] += bs_main * K
        prev, step = step, step + K
        if (step // cfg.get("print_freq", 50)
                != prev // cfg.get("print_freq", 50)
                or prev == 0) and is_main_process():
            print(f"step {step}/{max_steps} lr={float(sched(step)):.2e} "
                  f"{logger}", flush=True)
        if step // ckpt_step != prev // ckpt_step or step >= max_steps:
            from ..train.checkpoint import save_checkpoint

            # mid-run saves are async (the loop pays only the device->host
            # gather); the final save blocks so exit leaves a complete ckpt
            save_checkpoint(os.path.join(ctx.out_dir, "ckpt"), state,
                            step=step, block=step >= max_steps)
            append_log(ctx.out_dir, {"step": step,
                                     **logger.global_avg(),
                                     "elapsed": time.time() - t0})
    # Attribution probe (`bench_redispatch: N` in the YAML, bench-only): re-run
    # N dispatches on the LAST device-resident batch group — no new H2D, same
    # compiled step_fn and metric fetches. Sustained-vs-redispatch isolates the
    # input pipeline / H2D link; redispatch-vs-bench.py isolates any remaining
    # step-level delta. On the dev tunnel (~30 MB/s H2D) this is the only
    # reliable way to see past transfer contention (PERF.md).
    redisp = int(cfg.get("bench_redispatch", 0))
    stats_redisp = None
    if redisp and perf["dispatches"] > 2:
        t0r = time.perf_counter()
        for _ in range(redisp):
            rng, sub = jax.random.split(rng)
            with ctx.mesh:
                state, rmetrics = step_fn(state, batches, sub)
            jax.device_get({k: v for k, v in rmetrics.items()
                            if jnp.ndim(v) == 0})  # force completion
        dtr = time.perf_counter() - t0r
        stats_redisp = bs_main * K * redisp / dtr
        if is_main_process():
            print(f"### redispatch {stats_redisp:.1f} samples/s/process "
                  f"(device-resident input)", flush=True)

    # stop the lookahead thread (daemon, so an exception path can't hang
    # the process; on the normal path free its buffered device batches now)
    batch_iter_dev.close()
    stats = logger.global_avg()
    if stats_redisp is not None:
        stats["redispatch_samples_per_sec"] = stats_redisp
    if perf["secs"] > 0:
        stats["samples_per_sec"] = perf["samples"] / perf["secs"]
        # Device-only rate: excludes the input wait (next() blocks when the
        # host pipeline / H2D link is the bottleneck — e.g. the dev tunnel's
        # ~30 MB/s H2D, PERF.md). Separates "the step is slow" from "the
        # step is starved"; on a real TPU-VM host the two rates converge.
        dev_secs = perf["secs"] - perf["input_secs"]
        if dev_secs > 0:
            stats["device_samples_per_sec"] = perf["samples"] / dev_secs
        if is_main_process():
            dev = stats.get("device_samples_per_sec")
            print(f"### throughput {stats['samples_per_sec']:.1f} "
                  f"samples/s/process (post-warmup"
                  + (f"; device-only {dev:.1f}" if dev else "") + ")",
                  flush=True)
    return stats
