"""End-to-end GLUE slice smoke test (SURVEY.md §7.3 milestone): synthetic
MRPC-style jsonl → run.py glue task → accuracy improves on a separable toy
problem."""
import json
import os
import types

import numpy as np
import pytest


def make_jsonl(path, n, seed):
    """Trivially separable 2-class paraphrase-ish data."""
    rng = np.random.default_rng(seed)
    pos = ["the cat sat on the mat", "a dog ran in the park",
           "birds fly over the lake"]
    neg = ["stocks fell sharply today", "the engine needs repair",
           "rain is expected tomorrow"]
    with open(path, "w") as f:
        for i in range(n):
            label = int(rng.integers(0, 2))
            pool = pos if label else neg
            s1 = pool[int(rng.integers(0, len(pool)))]
            s2 = pool[int(rng.integers(0, len(pool)))]
            f.write(json.dumps({"sentence1": s1, "sentence2": s2,
                                "label": label}) + "\n")


@pytest.mark.slow
def test_glue_mrpc_end_to_end(tmp_path):
    import yaml

    train = tmp_path / "train.jsonl"
    val = tmp_path / "val.jsonl"
    make_jsonl(train, 256, 0)
    make_jsonl(val, 32, 1)
    cfg = dict(
        task_name="mrpc", num_labels=2, max_length=16,
        per_device_train_batch_size=2,  # 2 × 8 devices = 16 global
        per_device_eval_batch_size=2,
        learning_rate=2e-3, weight_decay=0.0, num_train_epochs=2,
        num_warmup_steps=0,
        train_file=str(train), validation_file=str(val),
        text_encoder="roberta-base",
        text_num_hidden_layers=2, text_fusion_start_at=2,
        fusion_num_hidden_layers=0, fusion_fusion_start_at=0,
        text_hidden_size=32, text_num_attention_heads=2,
        text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2,
    )
    cfg_path = tmp_path / "glue.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from xfm_tpu.tasks import glue

    args = types.SimpleNamespace(config=str(cfg_path),
                                 output_dir=str(tmp_path / "out"),
                                 checkpoint=None, evaluate=False, bs=None,
                                 epoch=None, seed=0)
    metrics = glue.main(args)
    assert "accuracy" in metrics
    assert metrics["accuracy"] >= 0.8, metrics  # separable toy data
    assert os.path.exists(tmp_path / "out" / "log.txt")


@pytest.mark.slow
def test_glue_evaluate_only(tmp_path):
    """GLUE `--evaluate`: metrics from the validation split, no training
    (reference run_glue.py eval-only use)."""
    import yaml

    val = tmp_path / "val.jsonl"
    make_jsonl(val, 16, 1)
    cfg = dict(
        task_name="mrpc", num_labels=2, max_length=16,
        per_device_eval_batch_size=2,
        learning_rate=2e-3, weight_decay=0.0, num_train_epochs=1,
        num_warmup_steps=0,
        train_file=str(val), validation_file=str(val),
        text_encoder="roberta-base",
        text_num_hidden_layers=2, text_fusion_start_at=2,
        fusion_num_hidden_layers=0, fusion_fusion_start_at=0,
        text_hidden_size=32, text_num_attention_heads=2,
        text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2,
    )
    cfg_path = tmp_path / "glue_eval.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from xfm_tpu.tasks import glue

    args = types.SimpleNamespace(config=str(cfg_path),
                                 output_dir=str(tmp_path / "out"),
                                 checkpoint=None, evaluate=True, bs=None,
                                 epoch=None, seed=0)
    metrics = glue.main(args)
    assert "accuracy" in metrics and 0.0 <= metrics["accuracy"] <= 1.0
