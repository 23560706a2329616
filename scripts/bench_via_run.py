#!/usr/bin/env python3
"""Throughput check through the PRODUCT path: `run.py --task pretrain_DIY`
on synthetic data must reach bench.py's samples/s (VERDICT round-1: the
measured 48% MFU lived only in bench.py's hand-built config).

Generates synthetic image-text JSONL shards + a full-size XFM-base pretrain
config (bf16 compute via the default precision policy, tanh-GELU recipe,
`dispatch_steps` scan stepping), runs the real CLI, and prints ONE JSON line
with the task-path samples/s.

Usage: python scripts/bench_via_run.py [--batch 48] [--steps 40]
       [--dispatch 10] [--workers N]
"""
import argparse
import base64
import io
import json
import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(path: str, n: int = 256, res: int = 256) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    with open(path, "w") as f:
        for i in range(n):
            arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=80)
            b64 = base64.b64encode(buf.getvalue()).decode()
            f.write(json.dumps(
                {"binary": b64,
                 "desc": f"a synthetic benchmark image number {i} with a few "
                         f"caption words"}) + "\n")


def make_config(path: str, data_path: str, batch: int, steps: int,
                dispatch: int, workers: int, no_dropout: bool = False) -> None:
    import yaml

    cfg = dict(
        train_file=[data_path],
        train_dataset_size=steps * batch,
        images={"image_key": "binary", "is_image_rpath": False,
                "caption_key": "desc", "batch_size": batch,
                "num_workers": workers},
        use_beit_v2=True,
        vision_config="configs/model/config_beit2_base.json",
        image_res=224, patch_size=16, local_attn_depth=-1,
        text_encoder="data/roberta-base",
        text_num_hidden_layers=12, text_fusion_start_at=12,
        fusion_num_hidden_layers=12, fusion_fusion_start_at=0,
        # from-scratch pretrain recipe: tanh-GELU (PERF.md "Activation
        # choice"); compute dtype resolves to bf16 via the default policy
        hidden_act="gelu_tanh",
        embed_dim=256, temp=0.07, learnable_temp=True,
        max_words=30, max_tokens=30, mask_prob=0.5, max_masks=15,
        num_masking_patches=75, min_num_patches=16, use_mm_mim_loss=True,
        max_steps=steps, dispatch_steps=dispatch,
        bench_redispatch=3,  # post-loop device-resident-input probe
        ckpt_frequent_step=10 ** 9,  # no checkpoints mid-bench
        print_freq=dispatch,
        schedular={"sched": "linear", "lr": 1e-4, "epochs": 1,
                   "num_warmup_steps": 100},
        optimizer={"lr": 1e-4, "weight_decay": 0.01, "lr_mult": 2.0},
        accelerator={"FP16_OPT_LEVEL": "O1", "CLIP_GRAD_NORM": 1.0},
        parallel={"data": -1, "fsdp": 1, "tensor": 1},
    )
    if no_dropout:  # attribution vs bench.py's deterministic step
        cfg.update(drop_path_rate=0.0, hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--dispatch", type=int, default=10)
    ap.add_argument("--workers", type=int,
                    default=int(os.environ.get("XFM_BENCH_WORKERS", "8")))
    ap.add_argument("--no_dropout", action="store_true")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="xfm_bench_run_")
    data_path = os.path.join(tmp, "pairs.jsonl")
    cfg_path = os.path.join(tmp, "bench.yaml")
    make_data(data_path)
    make_config(cfg_path, data_path, args.batch, args.steps, args.dispatch,
                args.workers, no_dropout=args.no_dropout)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "--task", "pretrain_DIY", "--config", cfg_path,
         "--output_dir", os.path.join(tmp, "out")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
    m = re.search(r"### throughput ([0-9.]+) samples/s", proc.stdout)
    if proc.returncode != 0 or not m:
        print(json.dumps({"metric": "pretrain_samples_per_sec_via_run",
                          "value": None, "unit": "samples/s/chip",
                          "error": f"rc={proc.returncode}"}))
        sys.exit(1)
    out = {
        "metric": "pretrain_samples_per_sec_via_run",
        "value": round(float(m.group(1)), 2),
        "unit": "samples/s/chip",
    }
    # device-only rate (input wait excluded): the honest step-speed number
    # when the dev host's ~30 MB/s tunnel makes the product path input-bound
    md = re.search(r"device-only ([0-9.]+)\)", proc.stdout)
    if md:
        out["device_only"] = round(float(md.group(1)), 2)
    mr = re.search(r"### redispatch ([0-9.]+) samples/s", proc.stdout)
    if mr:
        out["redispatch"] = round(float(mr.group(1)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
