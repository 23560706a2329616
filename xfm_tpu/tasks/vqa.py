"""VQA fine-tuning + answer-ranking evaluation (reference VQA.py).

Eval ranks the fixed 3129-answer list with XFMForVQA.rank_answer
(reference VQA.py:75-100); per-process result shards merge via
collect_results (reference dataset/utils.py:116-152 collect_result).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.finetune_data import VQAData
from ..data.transforms import TestTransform, TrainTransform
from ..models import XFMForVQA, config_from_yaml
from ..train.metrics import is_main_process
from ..train.train_state import make_train_step
from .common import task_rng, TaskContext, append_log, build_state, train_epoch
from .retrieval import build_tokenizer_or_fallback, _maybe_shrink_vocab


def collect_results(result: list, out_dir: str, filename: str) -> str:
    """Per-process jsonl shards → merged json on process 0
    (reference dataset/utils.py:116-152)."""
    os.makedirs(out_dir, exist_ok=True)
    shard = os.path.join(out_dir, f"{filename}_rank{jax.process_index()}.json")
    with open(shard, "w") as f:
        json.dump(result, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("collect_results")
    final = os.path.join(out_dir, f"{filename}.json")
    if is_main_process():
        merged = []
        for r in range(jax.process_count()):
            p = os.path.join(out_dir, f"{filename}_rank{r}.json")
            if os.path.exists(p):
                with open(p) as f:
                    merged += json.load(f)
        with open(final, "w") as f:
            json.dump(merged, f)
    return final


def evaluate(model, params, data: VQAData, k: int, out_dir: str,
             tag: str = ""):
    ans_ids, ans_atts = data.encode_answer_list()
    ans_ids, ans_atts = jnp.asarray(ans_ids), jnp.asarray(ans_atts)

    @jax.jit
    def rank(params, images, q_ids, q_atts):
        return model.apply({"params": params}, images, q_ids, q_atts,
                           train=False, answer_list_ids=ans_ids,
                           answer_list_atts=ans_atts, k=k)

    results = []
    for batch in data.epoch():
        topk_ids, topk_probs = rank(params, jnp.asarray(batch["images"]),
                                    jnp.asarray(batch["q_ids"]),
                                    jnp.asarray(batch["q_atts"]))
        top1 = np.asarray(topk_ids)[:, 0]
        for qid, aid in zip(batch["question_id"], top1):
            results.append({"question_id": int(qid),
                            "answer": data.answer_list[int(aid)]})
    return collect_results(results, os.path.join(out_dir, "result"),
                           "vqa_result" + (f"_{tag}" if tag else ""))


def calculate_acc(result_path: str, data: VQAData) -> dict:
    """Accuracy when ground truth is present in the test annotations
    (reference VQA.py:103-122 exact match; plus the official 10-answer
    weighted accuracy via eval/vqa_eval.py when multi-answer annotations are
    available — reference vqaTools/vqaEval.py)."""
    import json

    exact_gt = {}
    multi_gt = {}
    for ann in data.ann:
        qid = ann.get("question_id")
        if qid is None:
            continue
        if isinstance(ann.get("answer"), str):
            exact_gt[int(qid)] = ann["answer"].strip()
        elif isinstance(ann.get("answer"), list) and ann["answer"]:
            multi_gt[int(qid)] = [str(a) for a in ann["answer"]]
    if not exact_gt and not multi_gt:
        return {}
    with open(result_path) as f:
        preds = json.load(f)
    out = {}
    if exact_gt:
        n = n_correct = 0
        for p in preds:
            qid = int(p["question_id"])
            if qid in exact_gt:
                n += 1
                n_correct += int(p["answer"].strip() == exact_gt[qid])
        if n:
            out["vqa_acc_exact"] = n_correct / n
    if multi_gt:
        from ..eval.vqa_eval import vqa_accuracy

        out["vqa_acc_official"] = vqa_accuracy(preds, multi_gt)
    return out


def main(args, config: Optional[dict] = None):
    ctx = TaskContext.from_args(args)
    cfg = ctx.config
    image_res = cfg.get("image_res", 480)
    tokenizer = build_tokenizer_or_fallback(cfg)
    pad_id = getattr(tokenizer, "pad_token_id", 1)
    mcfg = _maybe_shrink_vocab(config_from_yaml(cfg), tokenizer)
    model = XFMForVQA(mcfg, num_dec_layers=cfg.get("num_dec_layers", 12),
                      decoder_fusion_start_at=cfg.get(
                          "decoder_fusion_start_at", 0),
                      pad_token_id=pad_id)

    roots = {"vqa": cfg.get("vqa_root", "."), "vg": cfg.get("vg_root", ".")}
    test_data = VQAData(cfg["test_file"], TestTransform(image_res), roots,
                        tokenizer, batch_size=cfg.get("batch_size_test", 16),
                        split="test", answer_list=cfg.get("answer_list"))
    train_data = None
    if not args.evaluate:
        train_data = VQAData(cfg["train_file"],
                             TrainTransform(image_res, hflip=False), roots,
                             tokenizer,
                             batch_size=cfg.get("batch_size_train", 16),
                             split="train")

    T = 40
    example = dict(images=jnp.zeros((2, image_res, image_res, 3)),
                   text_ids=jnp.ones((2, T), jnp.int32),
                   text_atts=jnp.ones((2, T), jnp.int32))
    steps = (max(1, len(train_data) // train_data.batch_size)
             if train_data else 1)
    state, sched = build_state(ctx, model, example, XFMForVQA.init_all,
                               steps)

    if args.checkpoint:
        from ..train.checkpoint import (import_xfm_checkpoint,
                                        load_torch_state_dict, merge_params,
                                        to_jax)

        sd = load_torch_state_dict(args.checkpoint)
        imported = import_xfm_checkpoint(sd, mcfg)
        vqa_ckpt = args.evaluate or cfg.get("load_vqa_pretrain", False)
        has_decoder = any(k.startswith("text_decoder.") for k in sd)
        if vqa_ckpt and has_decoder:
            # VQA-format checkpoint: its own decoder weights, loaded
            # verbatim (reference models/model_generation.py:61-63
            # is_eval / --load_vqa_pretrain path)
            from ..train.checkpoint import import_text_encoder, strip_prefix

            sub = strip_prefix(sd, "text_decoder.roberta.")
            sub.update({k[len("text_decoder."):]: v for k, v in sd.items()
                        if k.startswith("text_decoder.lm_head.")})
            if not sub:
                sub = strip_prefix(sd, "text_decoder.bert.")
                sub.update({k[len("text_decoder."):]: v for k, v in sd.items()
                            if k.startswith("text_decoder.cls.")})
            from ..models.generation import make_decoder_config

            dec_cfg = make_decoder_config(
                mcfg, cfg.get("num_dec_layers", 12),
                cfg.get("decoder_fusion_start_at", 0))
            imported["text_decoder"] = import_text_encoder(
                sub, dec_cfg, with_mlm=True)
        elif "backbone" in imported and \
                "fusion_encoder" in imported["backbone"]:
            # decoder initialized from the fusion encoder
            # (reference models/model_generation.py:83-86)
            imported["text_decoder"] = imported["backbone"]["fusion_encoder"]
        params, missing, _ = merge_params(state.params, to_jax(imported))
        state = state.replace(params=params)

    if args.evaluate:
        path = evaluate(model, state.params, test_data,
                        cfg.get("k_test", 128), ctx.out_dir)
        print("wrote", path, flush=True)
        acc = calculate_acc(path, test_data) if is_main_process() else {}
        if acc:
            print(acc, flush=True)
            append_log(ctx.out_dir, acc)
        return {"result_file": path, **acc} if acc else path

    def loss_fn(params, batch, rng):
        loss = model.apply({"params": params}, batch["images"],
                           batch["q_ids"], batch["q_atts"],
                           answer_ids=batch["answer_ids"],
                           answer_atts=batch["answer_atts"],
                           ques_idx=batch["ques_idx"],
                           weights=batch["weights"], train=True,
                           deterministic=False, rngs={"dropout": rng})
        return loss, {}

    # accumulate_steps (reference VQA.py:55-65 pattern shared with
    # Retrieval.py): K micro-batches per optimizer step
    from .common import make_task_step

    step_fn, accum = make_task_step(ctx, loss_fn)
    rng = task_rng(ctx)
    from .common import maybe_resume_epochs, save_epoch_checkpoint

    state, start_epoch = maybe_resume_epochs(ctx, state)
    start_eval = int(cfg.get("start_eval", 0))
    for epoch in range(start_epoch,
                       int(cfg.get("schedular", {}).get("epochs", 8))):
        loader = train_data.epoch(epoch_seed=ctx.seed + epoch)
        state, stats = train_epoch(ctx, state, step_fn, loader, rng, epoch,
                                   sched, accum_steps=accum)
        append_log(ctx.out_dir, {"epoch": epoch, **stats})
        save_epoch_checkpoint(ctx, state, epoch)
        if epoch >= start_eval and epoch < int(
                cfg.get("schedular", {}).get("epochs", 8)) - 1:
            # per-epoch eval from start_eval on (reference VQA.py:262);
            # the final-epoch eval below always runs
            p = evaluate(model, state.params, test_data,
                         cfg.get("k_test", 128), ctx.out_dir,
                         tag=f"epoch{epoch}")
            acc = calculate_acc(p, test_data) if is_main_process() else {}
            if acc:
                append_log(ctx.out_dir, {"epoch": epoch, **acc})
    path = evaluate(model, state.params, test_data, cfg.get("k_test", 128),
                    ctx.out_dir)
    acc = calculate_acc(path, test_data) if is_main_process() else {}
    if acc:
        print(acc, flush=True)
        append_log(ctx.out_dir, acc)
        return {"result_file": path, **acc}
    return path
