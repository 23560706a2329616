"""COCO captioning: CE fine-tune, domain pretrain, SCST, bulk inference
(reference Captioning.py, Captioning_pretrain.py, Captioning_scst.py,
run_infer_caption.py).

SCST (reference Captioning_scst.py:41-96): greedy baseline (no grad) +
N sampled captions with logprobs from the jitted scan decoder, CIDEr-D
rewards, loss = −mean(logp · (reward − baseline)).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.finetune_data import CaptioningData
from ..data.transforms import TestTransform, TrainTransform
from ..eval.caption_metrics import coco_caption_eval
from ..eval.cider import CiderD
from ..models import XFMForCaptioning, config_from_yaml, generate
from ..models.generation import beam_generate, shift_lm_loss
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab
from .vqa import collect_results


def _special_ids(tokenizer):
    return (getattr(tokenizer, "bos_token_id", 0) or 0,
            getattr(tokenizer, "sep_token_id", 2) or 2,
            getattr(tokenizer, "pad_token_id", 1) or 1)


def prompt_token_ids(tokenizer, prompt: str) -> tuple:
    """Prompt token ids without specials, for decode-time forcing
    (reference models/model_generation.py:268-269,339: the decoder is
    seeded with tokenizer(prompt).input_ids[:-1] = [CLS] + prompt tokens,
    and decoded captions are stripped of the prompt)."""
    if not prompt:
        return ()
    try:
        ids = tokenizer(prompt)["input_ids"]
    except Exception:
        ids = tokenizer.encode(prompt)
    ids = np.asarray(ids).reshape(-1).tolist()
    specials = {getattr(tokenizer, a, None) for a in
                ("bos_token_id", "cls_token_id", "sep_token_id",
                 "eos_token_id", "pad_token_id")}
    return tuple(int(i) for i in ids if i not in specials)


def decode_ids(tokenizer, ids, eos_id, pad_id):
    toks = []
    for i in ids:
        if i in (eos_id, pad_id):
            break
        toks.append(int(i))
    try:
        return tokenizer.decode(toks, skip_special_tokens=True).strip()
    except Exception:
        return " ".join(map(str, toks))


def generate_captions(model, variables, data: CaptioningData, tokenizer,
                      max_len=20, min_len=0, num_beams=1, prompt_ids=()):
    """Bulk caption generation: beam search when num_beams > 1 (reference
    Captioning.py:86-87 evaluates with config num_beams/min_length —
    configs/xfm-ft/Captioning.yaml:32-35), greedy otherwise. The decoder is
    seeded with the training-time prompt and the forced slots are stripped
    before scoring (reference models/model_generation.py:323-347)."""
    bos, eos, pad = _special_ids(tokenizer)
    P = len(prompt_ids)
    results = []
    for batch in data.epoch():
        images = jnp.asarray(batch["images"])
        if num_beams > 1:
            seqs = beam_generate(model, variables, images, bos_id=bos,
                                 eos_id=eos, pad_id=pad, max_len=max_len,
                                 min_len=min_len, num_beams=num_beams,
                                 prompt_ids=prompt_ids)
        else:
            seqs, _ = generate(model, variables, images, bos_id=bos,
                               eos_id=eos, pad_id=pad, max_len=max_len,
                               min_len=min_len, greedy=True,
                               prompt_ids=prompt_ids)
        for iid, seq in zip(batch["image_id"], np.asarray(seqs)):
            results.append({"image_id": int(iid),
                            "caption": decode_ids(tokenizer, seq[P:],
                                                  eos, pad)})
    return results


def build_model(cfg, tokenizer):
    mcfg = _maybe_shrink_vocab(config_from_yaml(cfg), tokenizer)
    pad = getattr(tokenizer, "pad_token_id", 1)
    return XFMForCaptioning(
        mcfg, num_dec_layers=cfg.get("num_dec_layers", 12),
        decoder_fusion_start_at=cfg.get("decoder_fusion_start_at", 0),
        pad_token_id=pad,
        prompt_length=cfg.get("prompt_length", 0),
        label_smoothing=cfg.get("label_smoothing", 0.0),
        # KV cache sized to the decode budget, not the 514-slot position
        # table (saves HBM + scan-carry width on the serving path)
        max_decode_len=int(cfg.get("max_length", 20))
        + int(cfg.get("prompt_length", 0)) + 2), mcfg


def load_ckpt_into(state, mcfg, ckpt_path, decoder_from="fusion"):
    """decoder_from: 'fusion' — fine-tune decoder from fusion weights
    (reference models/model_generation.py:275,83-86); 'text' — domain
    pretrain copies TEXT-encoder weights into the decoder (reference
    models/model_generation.py:219-235 text_encoder.* → text_decoder.*);
    None — leave the decoder at init."""
    from ..train.checkpoint import (import_xfm_checkpoint,
                                    load_torch_state_dict, merge_params,
                                    to_jax)

    sd = load_torch_state_dict(ckpt_path)
    imported = import_xfm_checkpoint(sd, mcfg)
    if decoder_from == "text":
        # re-import the text encoder WITH its MLM head (the reference's
        # text_encoder.* → text_decoder.* rename copies lm_head too)
        from ..train.checkpoint import import_text_encoder, strip_prefix

        sub = strip_prefix(sd, "text_encoder.roberta.")
        sub.update({k[len("text_encoder."):]: v for k, v in sd.items()
                    if k.startswith("text_encoder.lm_head.")})
        if not sub:
            sub = strip_prefix(sd, "text_encoder.bert.")
            sub.update({k[len("text_encoder."):]: v for k, v in sd.items()
                        if k.startswith("text_encoder.cls.")})
        if sub:
            imported["text_decoder"] = import_text_encoder(
                sub, mcfg.text, with_mlm=True)
    elif decoder_from == "fusion" and \
            "fusion_encoder" in imported.get("backbone", {}):
        imported["text_decoder"] = imported["backbone"]["fusion_encoder"]
    params, missing, _ = merge_params(state.params, to_jax(imported))
    return state.replace(params=params)


def main(args, config: Optional[dict] = None, scst: bool = False):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 384)
    tokenizer = build_tokenizer_or_fallback(cfg)
    model, mcfg = build_model(cfg, tokenizer)
    bos, eos, pad = _special_ids(tokenizer)

    val_data = CaptioningData(cfg["val_file"], TestTransform(image_res),
                              cfg["image_root"], tokenizer,
                              batch_size=cfg.get("batch_size_test", 16),
                              train=False)
    train_data = None
    if not args.evaluate:
        train_data = CaptioningData(
            cfg["train_file"], TrainTransform(image_res, hflip=False),
            cfg["image_root"], tokenizer,
            max_tokens=cfg.get("max_tokens", 30),
            batch_size=cfg.get("batch_size_train", 16), train=True,
            prompt=cfg.get("prompt", ""))

    T = cfg.get("max_tokens", 30)
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    steps = (max(1, len(train_data) // train_data.batch_size)
             if train_data else 1)
    state, sched = build_state(ctx, model, example,
                               XFMForCaptioning.init_all, steps)
    if args.checkpoint:
        state = load_ckpt_into(state, mcfg, args.checkpoint)

    pids = prompt_token_ids(tokenizer, cfg.get("prompt", ""))
    if args.evaluate:
        results = generate_captions(model, {"params": state.params},
                                    val_data, tokenizer,
                                    cfg.get("max_length", 20),
                                    min_len=cfg.get("min_length", 0),
                                    num_beams=cfg.get("num_beams", 1),
                                    prompt_ids=pids)
        path = collect_results(results, os.path.join(ctx.out_dir, "result"),
                               "caption_result")
        metrics = _score_captions(results, cfg)
        print(metrics, flush=True)
        return metrics

    if scst:
        return train_scst(ctx, cfg, model, state, train_data, tokenizer)

    def loss_fn(params, batch, rng):
        loss = model.apply({"params": params}, batch["images"],
                           batch["text_ids"], batch["text_atts"],
                           train=True, deterministic=False,
                           rngs={"dropout": rng})
        return loss, {}

    step_fn = make_train_step(loss_fn)
    rng = task_rng(ctx)
    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    for epoch in range(start_epoch,
                       int(cfg.get("schedular", {}).get("epochs", 5))):
        loader = train_data.epoch(epoch_seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched)
        append_log(ctx.out_dir, {"epoch": epoch, **stats})
        save_epoch_checkpoint(ctx, state, epoch)
    results = generate_captions(model, {"params": state.params}, val_data,
                                tokenizer, cfg.get("max_length", 20),
                                min_len=cfg.get("min_length", 0),
                                num_beams=cfg.get("num_beams", 1),
                                prompt_ids=pids)
    metrics = _score_captions(results, cfg)
    append_log(ctx.out_dir, {"final": metrics})
    return metrics


def train_scst(ctx, cfg, model, state, train_data, tokenizer):
    """SCST RL fine-tune (reference Captioning_scst.py:41-96)."""
    bos, eos, pad = _special_ids(tokenizer)
    # reference key sc_train_sample_n (Captioning_scst.py:57); the older
    # scst_num_samples spelling stays accepted
    n_samples = int(cfg.get("sc_train_sample_n",
                            cfg.get("scst_num_samples", 5)))
    baseline_type = cfg.get("sc_baseline_type", "greedy")
    assert baseline_type in ("greedy", "sample"), baseline_type
    if baseline_type == "sample" and n_samples < 2:
        raise ValueError("sc_baseline_type: sample needs sc_train_sample_n "
                         ">= 2 (leave-one-out baseline)")
    max_len = cfg.get("max_length", 20)
    # decode with the training prompt; forced slots are stripped from the
    # reward text and masked out of the policy gradient (reference
    # model_generation.py:323-347 decodes from the prompt prefix)
    pids = prompt_token_ids(tokenizer, cfg.get("prompt", ""))
    P = len(pids)

    # group references per image for the reward
    refs = {}
    for a in train_data.ann:
        iid = str(a.get("image_id", a.get("image")))
        refs.setdefault(iid, []).append(a["caption"])
    cider = CiderD(refs)

    def logp_fn(params, images, seqs):
        def run(m, images, full):
            # the n sampled sequences of an image are contiguous rows:
            # grouped cross-attention scores them against once-projected
            # image k/v instead of repeating the embeds n_samples x
            # (differentiable — the group's cotangents sum into the shared
            # k/v, exactly the repeat formulation's gradient)
            image_embeds = m.backbone.get_vision_embeds(images)
            atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
            hidden = m.text_decoder(full, attention_mask=None,
                                    encoder_hidden_states=image_embeds,
                                    encoder_attention_mask=atts,
                                    encoder_group_size=n_samples)
            return m.text_decoder.mlm_logits(hidden, None)

        full = jnp.concatenate([jnp.full((seqs.shape[0], 1), bos,
                                         jnp.int32), seqs], axis=1)
        logits = model.apply({"params": params}, images, full, method=run)
        labels = jnp.where(full == pad, -100, full)
        if P:
            # BOS + forced prompt slots are not policy choices
            pos = jnp.arange(labels.shape[1])[None]
            labels = jnp.where(pos <= P, -100, labels)
        return -shift_lm_loss(logits, labels)  # [B*n] total logp

    @jax.jit
    def scst_step(state, images, seqs, advantages, rng):
        def lf(params):
            logp = logp_fn(params, images, seqs)
            return -jnp.mean(logp * advantages), {}

        (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    rng = task_rng(ctx)
    step = 0
    for epoch in range(int(cfg.get("schedular", {}).get("epochs", 3))):
        for batch in train_data.epoch(epoch_seed=ctx.seed + epoch):
            images = jnp.asarray(batch["images"])
            variables = {"params": state.params}
            greedy_seqs = None
            if baseline_type == "greedy":
                greedy_seqs, _ = generate(model, variables, images,
                                          bos_id=bos, eos_id=eos, pad_id=pad,
                                          max_len=max_len, greedy=True,
                                          prompt_ids=pids)
            rng, sub = jax.random.split(rng)
            samp_seqs, _ = generate(model, variables, images, bos_id=bos,
                                    eos_id=eos, pad_id=pad, max_len=max_len,
                                    greedy=False, rng=sub,
                                    top_k=int(cfg.get("sample_top_k", 0)),
                                    top_p=float(cfg.get("sample_top_p",
                                                        1.0)),
                                    num_return_sequences=n_samples,
                                    prompt_ids=pids)
            # CIDEr rewards on host (forced prompt slots stripped)
            iids = [str(a) for a in batch.get("image_id",
                                              range(images.shape[0]))]
            rew = _reward(cider, tokenizer, samp_seqs[:, P:], iids, eos,
                          pad, n_samples)
            if baseline_type == "greedy":
                base = _reward(cider, tokenizer, greedy_seqs[:, P:], iids,
                               eos, pad, 1)
                adv = rew - np.repeat(base, n_samples)
            else:
                # 'sample' baseline: leave-one-out mean of the other
                # samples' rewards (reference utils/__init__.py:29-30)
                sc = rew.reshape(-1, n_samples)
                base = (sc.sum(1, keepdims=True) - sc) / (n_samples - 1)
                adv = (sc - base).reshape(-1)
            adv = jnp.asarray(adv, jnp.float32)
            state, loss = scst_step(state, images, jnp.asarray(samp_seqs),
                                    adv, sub)
            if step % 50 == 0 and is_main_process():
                print(f"scst step {step}: loss {float(loss):.4f} "
                      f"reward {rew.mean():.3f}", flush=True)
            step += 1
    return state


def _reward(cider, tokenizer, seqs, iids, eos, pad, n):
    hyp = {}
    keys = []
    for j, seq in enumerate(np.asarray(seqs)):
        key = f"{iids[j // n]}#{j}"
        hyp[key] = decode_ids(tokenizer, seq, eos, pad)
        keys.append(key)
    # score each hypo against its image's refs (corpus doc-freq reused)
    per = [cider.score_one(key.split("#")[0], hyp[key]) for key in keys]
    return np.asarray(per, np.float32)


def _score_captions(results, cfg):
    gt_file = cfg.get("val_gt_file") or cfg.get("val_file")
    import json as _json

    with open(gt_file) as f:
        ann = _json.load(f)
    refs = {}
    for a in ann:
        iid = a.get("image_id")
        if iid is None:
            continue
        caps = a["caption"] if isinstance(a["caption"], list) else [a["caption"]]
        refs.setdefault(int(str(iid).split("_")[-1]) if isinstance(iid, str)
                        else int(iid), []).extend(caps)
    hypos = {r["image_id"]: r["caption"] for r in results
             if r["image_id"] in refs}
    refs = {k: v for k, v in refs.items() if k in hypos}
    if not hypos:
        return {"CIDEr": 0.0}
    return coco_caption_eval({str(k): v for k, v in hypos.items()},
                             {str(k): v for k, v in refs.items()})


def main_domain_pretrain(args, config: Optional[dict] = None):
    """Caption-domain pretrain (reference Captioning_pretrain.py:151-178):
    LM loss over an image-text JSONL stream; decoder initialized from the
    text encoder (reference models/model_generation.py:204-253)."""
    from ..data.pretrain_data import ImageTextStream
    from ..data.transforms import TrainTransform

    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 224)
    tokenizer = build_tokenizer_or_fallback(cfg)
    model, mcfg = build_model(cfg, tokenizer)

    stream = ImageTextStream(
        cfg["train_file"], cfg, tokenizer,
        TrainTransform(image_res, hflip=False),
        rank=jax.process_index(), world_size=jax.process_count(),
        with_image_mask=False)

    T = cfg.get("max_tokens", 30)
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    state, sched = build_state(ctx, model, example,
                               XFMForCaptioning.init_all, 1)
    if args.checkpoint:
        state = load_ckpt_into(state, mcfg, args.checkpoint,
                               decoder_from="text")

    def loss_fn(params, batch, rng):
        loss = model.apply({"params": params}, batch["images"],
                           batch["text_ids"], batch["text_atts"],
                           train=True, deterministic=False,
                           rngs={"dropout": rng})
        return loss, {}

    step_fn = make_train_step(loss_fn)
    rng = task_rng(ctx)
    max_steps = int(cfg.get("max_steps", 1000))
    from ..core.mesh import shard_batch

    it = iter(stream)
    for step in range(max_steps):
        batch = dict(next(it))
        batch.pop("image_mask", None)
        batch = {k: batch[k] for k in ("images", "text_ids", "text_atts")}
        batch = shard_batch(ctx.mesh, batch)
        rng, sub = jax.random.split(rng)
        with ctx.mesh:
            state, metrics = step_fn(state, batch, sub)
        if step % cfg.get("print_freq", 50) == 0 and is_main_process():
            print(f"caption-pt step {step}: loss "
                  f"{float(metrics['loss']):.4f}", flush=True)
    from ..train.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(ctx.out_dir, "ckpt"), state,
                    step=max_steps)
    return state


def main_pipeline(args, config=None):
    """Two-stage coco_captioning (reference run.py:326-333). When the config
    carries `domain_pretrain: true` the caption-domain pretrain stage runs
    (main_domain_pretrain); otherwise — or with --load_ckpt_from pointing at
    a domain-pretrained checkpoint — the fine-tune stage runs."""
    from ..core.config import load_config

    cfg = load_config(args.config)
    if cfg.get("domain_pretrain", False):
        return main_domain_pretrain(args, config)
    if getattr(args, "load_ckpt_from", None) and not args.checkpoint:
        args.checkpoint = args.load_ckpt_from
    # `scst: true` = the reference's Captioning_scst.py stage
    return main(args, config, scst=bool(cfg.get("scst", False)))


def main_infer(args, config=None):
    """Bulk caption inference over an images dir
    (reference run_infer_caption.py)."""
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    tokenizer = build_tokenizer_or_fallback(cfg)
    model, mcfg = build_model(cfg, tokenizer)
    image_res = cfg.get("image_res", 384)
    from ..data.transforms import TestTransform, decode_image

    tt = TestTransform(image_res)
    # reference run_infer_caption.py reads `img_rdir`
    img_dir = cfg.get("image_dir") or cfg["img_rdir"]
    files = sorted(os.listdir(img_dir))
    example = dict(images=jnp.zeros((1, image_res, image_res, 3)),
                   text_ids=jnp.ones((1, 5), jnp.int32),
                   text_atts=jnp.ones((1, 5), jnp.int32))
    state, _ = build_state(ctx, model, example, XFMForCaptioning.init_all, 1)
    if args.checkpoint:
        state = load_ckpt_into(state, mcfg, args.checkpoint)
    bos, eos, pad = _special_ids(tokenizer)
    pids = prompt_token_ids(tokenizer, cfg.get("prompt", ""))
    results = []
    bs = cfg.get("batch_size_test", 16)
    for s in range(0, len(files), bs):
        chunk = files[s:s + bs]
        imgs = np.stack([tt(decode_image(os.path.join(img_dir, f)))
                         for f in chunk])
        variables = {"params": state.params}
        nb = cfg.get("num_beams", 1)
        if nb > 1:  # reference run_infer_caption.py decodes with beams
            seqs = beam_generate(model, variables, jnp.asarray(imgs),
                                 bos_id=bos, eos_id=eos, pad_id=pad,
                                 max_len=cfg.get("max_length", 20),
                                 min_len=cfg.get("min_length", 0),
                                 num_beams=nb, prompt_ids=pids)
        else:
            seqs, _ = generate(model, variables, jnp.asarray(imgs),
                               bos_id=bos, eos_id=eos, pad_id=pad,
                               max_len=cfg.get("max_length", 20),
                               min_len=cfg.get("min_length", 0),
                               greedy=True, prompt_ids=pids)
        for f, seq in zip(chunk, np.asarray(seqs)):
            results.append({"image": f,
                            "caption": decode_ids(tokenizer,
                                                  seq[len(pids):], eos,
                                                  pad)})
    out = os.path.join(ctx.out_dir, "captions.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)
    return results
