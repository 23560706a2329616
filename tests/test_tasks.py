"""End-to-end task smoke tests on synthetic data (SURVEY.md §4.5): tiny
configs, 8-device CPU mesh, one epoch each."""
import json
import os
import types

import numpy as np
import pytest
import yaml
from PIL import Image


def tiny_model_keys():
    return dict(
        text_encoder="roberta-base", text_num_hidden_layers=2,
        text_fusion_start_at=2, fusion_num_hidden_layers=2,
        fusion_fusion_start_at=0, text_hidden_size=32,
        text_num_attention_heads=2, text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2, embed_dim=16,
    )


def write_images(tmp_path, n):
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        name = f"img{i}.png"
        Image.fromarray(arr).save(tmp_path / name)
        names.append(name)
    return names


def make_args(cfg_path, out, **kw):
    return types.SimpleNamespace(config=str(cfg_path), output_dir=str(out),
                                 checkpoint=None, evaluate=False, bs=None,
                                 epoch=None, seed=0, **kw)


@pytest.mark.slow
def test_retrieval_end_to_end(tmp_path):
    names = write_images(tmp_path, 8)
    train_ann = [{"image": n, "caption": f"a photo of thing {i}",
                  "image_id": i} for i, n in enumerate(names)]
    test_ann = [{"image": n, "caption": [f"a photo of thing {i}"]}
                for i, n in enumerate(names)]
    (tmp_path / "train.json").write_text(json.dumps(train_ann))
    (tmp_path / "test.json").write_text(json.dumps(test_ann))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "train.json")],
               test_file=str(tmp_path / "test.json"),
               image_root=str(tmp_path), batch_size_train=8,
               batch_size_test=8, k_test=4, max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01, "lr_mult": 2})
    cfg_path = tmp_path / "ret.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import retrieval

    metrics = retrieval.main(make_args(cfg_path, tmp_path / "out"))
    assert "best_r_mean" in metrics
    assert os.path.exists(tmp_path / "out" / "log.txt")


@pytest.mark.slow
def test_nlvr_end_to_end(tmp_path):
    names = write_images(tmp_path, 6)
    ann = [{"images": [names[i], names[(i + 1) % 6]],
            "sentence": f"the pair number {i} matches",
            "label": "True" if i % 2 == 0 else "False"}
           for i in range(6)]
    (tmp_path / "nlvr.json").write_text(json.dumps(ann))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "nlvr.json")],
               val_file=str(tmp_path / "nlvr.json"),
               test_file=str(tmp_path / "nlvr.json"),
               image_root=str(tmp_path), batch_size=3, max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "nlvr.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import nlvr

    metrics = nlvr.main(make_args(cfg_path, tmp_path / "out"))
    assert 0.0 <= metrics["best_val_acc"] <= 1.0


@pytest.mark.slow
def test_grounding_end_to_end(tmp_path):
    names = write_images(tmp_path, 6)
    ann = [{"image": n, "text": f"the region {i}",
            "bbox": [4, 4, 20, 20], "ref_id": i}
           for i, n in enumerate(names)]
    (tmp_path / "g.json").write_text(json.dumps(ann))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "g.json")],
               test_file=str(tmp_path / "g.json"),
               image_root=str(tmp_path), batch_size=3, max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "g.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import grounding

    metrics = grounding.main(make_args(cfg_path, tmp_path / "out"))
    assert 0.0 <= metrics["best_iou50"] <= 1.0


@pytest.mark.slow
def test_captioning_end_to_end(tmp_path):
    names = write_images(tmp_path, 6)
    train = [{"image": n, "caption": f"a photo of item {i}",
              "image_id": i} for i, n in enumerate(names)]
    val = [{"image": n, "caption": [f"a photo of item {i}"],
            "image_id": i} for i, n in enumerate(names)]
    (tmp_path / "train.json").write_text(json.dumps(train))
    (tmp_path / "val.json").write_text(json.dumps(val))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "train.json")],
               val_file=str(tmp_path / "val.json"),
               image_root=str(tmp_path), batch_size_train=6,
               batch_size_test=6, max_tokens=12, max_length=6,
               num_dec_layers=2, decoder_fusion_start_at=0,
               prompt="a photo of ", prompt_length=4,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "cap.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import captioning

    metrics = captioning.main(make_args(cfg_path, tmp_path / "out"))
    assert "CIDEr" in metrics
    import os as _os

    assert _os.path.exists(tmp_path / "out" / "log.txt")


@pytest.mark.slow
@pytest.mark.parametrize("baseline", ["greedy", "sample"])
def test_captioning_scst_steps(tmp_path, baseline):
    """SCST RL loop: baseline (greedy decode or leave-one-out sample mean,
    reference Captioning_scst.py:57 sc_baseline_type) + sampled captions +
    CIDEr rewards + policy-gradient step (Captioning_scst.py:41-96)."""
    names = write_images(tmp_path, 4)
    train = [{"image": n, "caption": f"a photo of item {i}",
              "image_id": i} for i, n in enumerate(names)]
    (tmp_path / "train.json").write_text(json.dumps(train))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "train.json")],
               val_file=str(tmp_path / "train.json"),
               image_root=str(tmp_path), batch_size_train=4,
               batch_size_test=4, max_tokens=12, max_length=5,
               num_dec_layers=2, decoder_fusion_start_at=0,
               sc_train_sample_n=2, sc_baseline_type=baseline,
               schedular={"sched": "linear", "lr": 1e-4, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-4, "weight_decay": 0.01})
    cfg_path = tmp_path / "scst.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import captioning

    state = captioning.main(make_args(cfg_path, tmp_path / "out"),
                            scst=True)
    assert state is not None


@pytest.mark.slow
def test_refcoco_bbox_two_stage_pipeline(tmp_path):
    """refcoco_bbox pipeline (reference run.py:311-318): region-stream
    domain pretrain (Grounding_bbox_pretrain.py:181-207 semantics) then the
    bbox fine-tune seeded from the stage-1 checkpoint — one invocation."""
    import base64
    import io as _io

    # stage-1 region stream data
    rng = np.random.default_rng(0)
    with open(tmp_path / "regions.jsonl", "w") as f:
        for i in range(8):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            elems = [{"bb": [8, 8, 24, 24], "caption": f"region a {i}"},
                     {"bb": [32, 16, 16, 32], "caption": f"region b {i}"}]
            f.write(json.dumps({"binary": b64, "elems": elems}) + "\n")
    dp_cfg = dict(tiny_model_keys(),
                  train_file_regions=[str(tmp_path / "regions.jsonl")],
                  regions={"image_key": "binary", "is_image_rpath": False,
                           "caption_key": "caption", "batch_size": 4,
                           "max_images": 2, "max_regions": 2,
                           "min_perc_in_image": 0.3},
                  ret_bbox_loss=True, max_words=8, max_tokens=12,
                  max_masks=2, mask_prob=0.5,
                  train_dataset_size=8, max_steps=2, ckpt_frequent_step=2,
                  schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                             "num_warmup_steps": 0},
                  optimizer={"lr": 1e-3, "weight_decay": 0.01})
    yaml.safe_dump(dp_cfg, open(tmp_path / "dp.yaml", "w"))

    # stage-2 fine-tune data
    names = write_images(tmp_path, 6)
    ann = [{"image": n, "text": f"the region {i}",
            "bbox": [4, 4, 20, 20], "ref_id": i}
           for i, n in enumerate(names)]
    (tmp_path / "g.json").write_text(json.dumps(ann))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "g.json")],
               test_file=str(tmp_path / "g.json"),
               image_root=str(tmp_path), batch_size=3, max_tokens=12,
               domain_pretrain_config=str(tmp_path / "dp.yaml"),
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "g.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import grounding

    metrics = grounding.main_bbox_pipeline(
        make_args(cfg_path, tmp_path / "out", load_ckpt_from=None))
    assert 0.0 <= metrics["best_iou50"] <= 1.0
    # stage-1 artifacts exist
    assert os.path.isdir(tmp_path / "out" / "bbox_pretrain" / "ckpt")


@pytest.mark.slow
def test_vqa_end_to_end(tmp_path):
    """VQA task e2e (reference VQA.py): train one epoch, rank over an
    answer list, write the result json, and compute in-task accuracy from
    ground-truth annotations (reference VQA.py:103-122)."""
    names = write_images(tmp_path, 6)
    answers = ["yes", "no", "red", "blue"]
    train_ann = [{"image": n, "question": f"is thing {i} there",
                  "answer": [answers[i % 4]], "question_id": i,
                  "dataset": "vqa"} for i, n in enumerate(names)]
    test_ann = [{"image": n, "question": f"is thing {i} there",
                 "question_id": i, "answer": answers[i % 4],
                 "dataset": "vqa"} for i, n in enumerate(names)]
    (tmp_path / "train.json").write_text(json.dumps(train_ann))
    (tmp_path / "test.json").write_text(json.dumps(test_ann))
    (tmp_path / "answer_list.json").write_text(json.dumps(answers))
    cfg = dict(tiny_model_keys(), train_file=[str(tmp_path / "train.json")],
               test_file=str(tmp_path / "test.json"),
               answer_list=str(tmp_path / "answer_list.json"),
               vqa_root=str(tmp_path), vg_root=str(tmp_path),
               batch_size_train=3, batch_size_test=3, k_test=2,
               num_dec_layers=2, decoder_fusion_start_at=0,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "vqa.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import vqa

    out = vqa.main(make_args(cfg_path, tmp_path / "out"))
    assert isinstance(out, dict) and "vqa_acc_exact" in out
    assert 0.0 <= out["vqa_acc_exact"] <= 1.0
    assert os.path.exists(out["result_file"])


@pytest.mark.slow
def test_retrieval_evaluate_only(tmp_path):
    """`--evaluate` runs zero-shot eval and returns without training
    (reference Retrieval.py --evaluate semantics)."""
    names = write_images(tmp_path, 6)
    test_ann = [{"image": n, "caption": [f"a photo of thing {i}"]}
                for i, n in enumerate(names)]
    (tmp_path / "test.json").write_text(json.dumps(test_ann))
    cfg = dict(tiny_model_keys(), test_file=str(tmp_path / "test.json"),
               image_root=str(tmp_path), batch_size_test=6, k_test=4,
               max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "ret_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import retrieval

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    metrics = retrieval.main(args)
    assert "r_mean" in metrics
    # no training artifacts: evaluate-only must not write epoch checkpoints
    assert not os.path.exists(tmp_path / "out" / "ckpt")


@pytest.mark.slow
def test_nlvr_evaluate_only(tmp_path):
    names = write_images(tmp_path, 4)
    ann = [{"images": [names[i], names[(i + 1) % 4]],
            "sentence": f"the pair number {i} matches",
            "label": "True" if i % 2 == 0 else "False"}
           for i in range(4)]
    (tmp_path / "nlvr.json").write_text(json.dumps(ann))
    cfg = dict(tiny_model_keys(), val_file=str(tmp_path / "nlvr.json"),
               test_file=str(tmp_path / "nlvr.json"),
               image_root=str(tmp_path), batch_size=2, max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "nlvr_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import nlvr

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    metrics = nlvr.main(args)
    assert 0.0 <= metrics["acc"] <= 1.0


@pytest.mark.slow
def test_vqa_evaluate_only(tmp_path):
    """VQA `--evaluate`: ranks the answer list, writes the result json, and
    computes accuracy from gt — no training (reference VQA.py --evaluate)."""
    names = write_images(tmp_path, 4)
    answers = ["yes", "no"]
    test_ann = [{"image": n, "question": f"is thing {i} there",
                 "question_id": i, "answer": answers[i % 2],
                 "dataset": "vqa"} for i, n in enumerate(names)]
    (tmp_path / "test.json").write_text(json.dumps(test_ann))
    (tmp_path / "answer_list.json").write_text(json.dumps(answers))
    cfg = dict(tiny_model_keys(), test_file=str(tmp_path / "test.json"),
               answer_list=str(tmp_path / "answer_list.json"),
               vqa_root=str(tmp_path), vg_root=str(tmp_path),
               batch_size_test=2, k_test=2, num_dec_layers=2,
               decoder_fusion_start_at=0,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "vqa_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import vqa

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    out = vqa.main(args)
    assert isinstance(out, dict) and os.path.exists(out["result_file"])
    assert 0.0 <= out["vqa_acc_exact"] <= 1.0


@pytest.mark.slow
def test_captioning_evaluate_only(tmp_path):
    """Captioning `--evaluate`: generate, write caption_result json, score —
    no training (reference Captioning.py --evaluate)."""
    names = write_images(tmp_path, 4)
    val = [{"image": n, "caption": [f"a photo of item {i}"],
            "image_id": i} for i, n in enumerate(names)]
    (tmp_path / "val.json").write_text(json.dumps(val))
    cfg = dict(tiny_model_keys(), val_file=str(tmp_path / "val.json"),
               image_root=str(tmp_path), batch_size_test=4, max_tokens=12,
               max_length=6, num_dec_layers=2, decoder_fusion_start_at=0,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "cap_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import captioning

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    metrics = captioning.main(args)
    assert "CIDEr" in metrics
    assert not os.path.exists(tmp_path / "out" / "ckpt")


@pytest.mark.slow
def test_imagenet_end_to_end(tmp_path):
    """Imagenet classify task e2e (reference Imagenet.py): jsonl manifest,
    mixup/cutmix soft targets, half-cosine schedule, per-epoch eval."""
    names = write_images(tmp_path, 8)
    man = "\n".join(json.dumps({"image": n, "label": i % 2})
                    for i, n in enumerate(names))
    (tmp_path / "train.jsonl").write_text(man)
    (tmp_path / "val.jsonl").write_text(man)
    cfg = dict(tiny_model_keys(), train_root=str(tmp_path / "train.jsonl"),
               val_root=str(tmp_path / "val.jsonl"),
               image_root=str(tmp_path), batch_size=4,
               schedular={"epochs": 1}, warmup_epochs=0,
               optimizer={"lr": 1e-3, "weight_decay": 0.05})
    cfg_path = tmp_path / "in.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import imagenet

    metrics = imagenet.main(make_args(cfg_path, tmp_path / "out"))
    assert 0.0 <= metrics["best_acc1"] <= 1.0


@pytest.mark.slow
def test_imagenet_evaluate_only(tmp_path):
    names = write_images(tmp_path, 4)
    man = "\n".join(json.dumps({"image": n, "label": i % 2})
                    for i, n in enumerate(names))
    (tmp_path / "val.jsonl").write_text(man)
    cfg = dict(tiny_model_keys(), train_root=str(tmp_path / "val.jsonl"),
               val_root=str(tmp_path / "val.jsonl"),
               image_root=str(tmp_path), batch_size=4,
               schedular={"epochs": 1}, warmup_epochs=0,
               optimizer={"lr": 1e-3, "weight_decay": 0.05})
    cfg_path = tmp_path / "in_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import imagenet

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    metrics = imagenet.main(args)
    assert 0.0 <= metrics["acc1"] <= 1.0


@pytest.mark.slow
def test_classify_end_to_end(tmp_path):
    """Generic classify stream e2e — fused image+text classification
    (reference Classify.py, with its broken imports fixed)."""
    names = write_images(tmp_path, 6)
    rows = "\n".join(json.dumps({"image": n, "text": f"sample {i}",
                                 "label": i % 2})
                     for i, n in enumerate(names))
    (tmp_path / "cls.jsonl").write_text(rows)
    cfg = dict(tiny_model_keys(), train_file=str(tmp_path / "cls.jsonl"),
               val_file=str(tmp_path / "cls.jsonl"),
               image_root=str(tmp_path), batch_size=3, max_tokens=12,
               num_labels=2,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "cls.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import classify

    metrics = classify.main(make_args(cfg_path, tmp_path / "out"))
    assert 0.0 <= metrics["best_acc"] <= 1.0

    args = make_args(cfg_path, tmp_path / "out2")
    args.evaluate = True
    m = classify.main(args)
    assert 0.0 <= m["acc"] <= 1.0


@pytest.mark.slow
def test_infer_caption_bulk(tmp_path):
    """Bulk caption inference over an image dir writes captions.json
    (reference run_infer_caption.py; fixed: the reference's
    create_dataset('infer_caption') has no branch)."""
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    write_images(img_dir, 3)
    cfg = dict(tiny_model_keys(), image_dir=str(img_dir),
               batch_size_test=2, max_length=5, num_dec_layers=2,
               decoder_fusion_start_at=0, image_res=32,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "infer.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import captioning

    results = captioning.main_infer(make_args(cfg_path, tmp_path / "out"))
    assert len(results) == 3
    assert all("caption" in r and "image" in r for r in results)
    assert os.path.exists(tmp_path / "out" / "captions.json")


def test_run_cli_dispatch_table():
    """run.py accepts exactly the reference's 11 task names
    (reference run.py:289-339)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "xfm_run", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    expected = {"pretrain_DIY", "infer_caption", "itr_coco", "itr_flickr",
                "vqa", "nlvr", "refcoco_bbox", "glue", "imagenet",
                "coco_captioning", "classify"}
    assert set(mod.TASKS) == expected


def test_run_cli_default_config_fallback(tmp_path):
    """--config omitted or pointing at a missing file resolves to the
    task's default under configs/{--model}/ (reference run.py:118-291
    `if not os.path.exists(args.config): ...`)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "xfm_run2", os.path.join(root, "run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    args = mod.build_parser().parse_args(
        ["--task", "glue", "--output_dir", str(tmp_path)])
    assert mod.resolve_config(args) == os.path.join(
        root, "configs", "xfm-ft", "glue_mrpc.yaml")

    # nonexistent --config falls back the same way (itr_coco default)
    args = mod.build_parser().parse_args(
        ["--task", "itr_coco", "--config", "/no/such.yaml",
         "--output_dir", str(tmp_path)])
    assert mod.resolve_config(args).endswith("Retrieval_coco.yaml")

    # pretrain default ignores --model (reference run.py:289-291)
    args = mod.build_parser().parse_args(
        ["--task", "pretrain_DIY", "--model", "other",
         "--output_dir", str(tmp_path)])
    assert mod.resolve_config(args).endswith(
        "xfm-pt/Pretrain_XBrain_base_4m.yaml")

    # an existing --config always wins
    cfg = tmp_path / "c.yaml"
    cfg.write_text("{}")
    args = mod.build_parser().parse_args(
        ["--task", "glue", "--config", str(cfg),
         "--output_dir", str(tmp_path)])
    assert mod.resolve_config(args) == str(cfg)

    # classify has no shipped default -> clean error
    args = mod.build_parser().parse_args(
        ["--task", "classify", "--output_dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        mod.resolve_config(args)


@pytest.mark.slow
def test_grounding_evaluate_only(tmp_path):
    names = write_images(tmp_path, 4)
    ann = [{"image": n, "text": f"the region {i}",
            "bbox": [4, 4, 20, 20], "ref_id": i}
           for i, n in enumerate(names)]
    (tmp_path / "g.json").write_text(json.dumps(ann))
    cfg = dict(tiny_model_keys(), test_file=str(tmp_path / "g.json"),
               image_root=str(tmp_path), batch_size=2, max_tokens=12,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "g_eval.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import grounding

    args = make_args(cfg_path, tmp_path / "out")
    args.evaluate = True
    metrics = grounding.main(args)
    assert 0.0 <= metrics["iou50_acc"] <= 1.0


@pytest.mark.slow
def test_classify_text_classifier_ablation(tmp_path):
    """use_text_classifier (reference Classify.py →
    models/model_classification.py:98-150): text-only encoder + MLP head,
    no vision params."""
    rows = [{"text": f"sample number {i}", "label": i % 2}
            for i in range(8)]
    (tmp_path / "t.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    cfg = dict(tiny_model_keys(), train_file=str(tmp_path / "t.jsonl"),
               val_file=str(tmp_path / "t.jsonl"), num_labels=2,
               batch_size=4, max_tokens=10, use_text_classifier=True,
               schedular={"sched": "linear", "lr": 1e-3, "epochs": 1,
                          "num_warmup_steps": 0},
               optimizer={"lr": 1e-3, "weight_decay": 0.01})
    cfg_path = tmp_path / "c.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import classify

    metrics = classify.main(make_args(cfg_path, tmp_path / "out"))
    assert 0.0 <= metrics["best_acc"] <= 1.0


def test_opt_steps_per_epoch_divides_by_accumulation():
    """Schedule horizons count optimizer steps — one per K micro-batches
    (reference run_glue.py:314 num_update_steps_per_epoch =
    ceil(len(loader)/gradient_accumulation_steps)); without the division a
    K=8 run would finish having traversed 1/8 of the LR decay."""
    from xfm_tpu.tasks.common import opt_steps_per_epoch

    assert opt_steps_per_epoch({}, 100) == 100
    assert opt_steps_per_epoch({"accumulate_steps": 4}, 100) == 25
    assert opt_steps_per_epoch({"gradient_accumulation_steps": 8}, 100) == 13
    assert opt_steps_per_epoch({"accumulate_steps": 8}, 3) == 1


def test_mixup_cutmix_gates_and_minmax():
    """timm Mixup semantics (reference Imagenet.py:592-611): cutmix-only
    configs stay active; cutmix_minmax draws per-dimension SIDE ratios in
    the bounds (timm rand_bbox_minmax), not a uniform area ratio; both
    disabled -> unmixed smoothed one-hots."""
    from xfm_tpu.tasks.imagenet import mixup_cutmix

    r = np.random.default_rng(0)
    imgs = r.standard_normal((8, 32, 32, 3)).astype(np.float32)
    labels = np.arange(8) % 4

    # cutmix-only: mixing must happen (boxes pasted => some targets mixed)
    out, tgt = mixup_cutmix(np.random.default_rng(1), imgs.copy(), labels, 4,
                            mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0)
    assert not np.array_equal(out, imgs) or (tgt.max(1) < 0.95).any()

    # cutmix_minmax-only with mixup 0 must not crash (beta(0,0)) and must
    # erase sides within the bounds: area in [0.3^2, 0.7^2] of the image
    areas = []
    for s in range(20):
        out, tgt = mixup_cutmix(np.random.default_rng(s), imgs.copy(),
                                labels, 4, mixup_alpha=0.0, cutmix_alpha=0.0,
                                prob=1.0, cutmix_minmax=[0.3, 0.7])
        lam = tgt.max(1).min()  # smallest own-label weight ~ lam
        areas.append(1 - lam)
    areas = np.asarray(areas)
    # per-side ratio in [0.3,0.7] (minus clipping at borders) bounds the
    # erased area by 0.49; uniform-area sampling would exceed it ~half
    # the time
    assert areas.max() <= 0.49 + 1e-6
    assert areas.mean() < 0.35  # mean ~0.25 for side-sampling, 0.5 for area

    # both modes disabled: unmixed smoothed one-hot targets
    out, tgt = mixup_cutmix(np.random.default_rng(2), imgs.copy(), labels, 4,
                            mixup_alpha=0.0, cutmix_alpha=0.0, prob=1.0,
                            label_smoothing=0.1)
    np.testing.assert_array_equal(out, imgs)
    np.testing.assert_allclose(tgt.sum(1), 1.0, rtol=1e-6)
    assert (tgt.max(1) > 0.9).all()


def test_caption_prompt_forced_decode(tmp_path):
    """Decode is seeded with the training-time prompt tokens and callers
    strip them (reference models/model_generation.py:268-269,323-347:
    generate() feeds tokenizer(prompt).input_ids[:-1] and strips
    caption[len(prompt):]). Round-1/2 gap: decoding started at bare BOS."""
    import jax
    import jax.numpy as jnp

    from xfm_tpu.data.tokenization import SimpleTokenizer
    from xfm_tpu.models.generation import beam_generate, generate
    from xfm_tpu.tasks.captioning import build_model, prompt_token_ids

    tok = SimpleTokenizer.from_texts(["a picture of thing one two three"])
    cfg = dict(tiny_model_keys(), num_dec_layers=2,
               decoder_fusion_start_at=0, image_res=32, max_length=8,
               prompt="a picture of ", prompt_length=4)
    model, _ = build_model(cfg, tok)
    pids = prompt_token_ids(tok, cfg["prompt"])
    assert len(pids) == 3 and all(p > 4 for p in pids)  # no specials

    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        images=images,
                        text_ids=jnp.ones((2, 8), jnp.int32),
                        text_atts=jnp.ones((2, 8), jnp.int32),
                        method=model.init_all)["params"]

    seqs, lps = generate(model, {"params": params}, images, bos_id=1,
                         eos_id=2, pad_id=0, max_len=8, greedy=True,
                         prompt_ids=pids)
    seqs = np.asarray(seqs)
    np.testing.assert_array_equal(seqs[:, :3],
                                  np.tile(np.asarray(pids), (2, 1)))
    # forced slots carry zero logprob (not a policy/sampling choice)
    np.testing.assert_array_equal(np.asarray(lps)[:, :3], 0.0)

    bseqs = np.asarray(beam_generate(model, {"params": params}, images,
                                     bos_id=1, eos_id=2, pad_id=0,
                                     max_len=8, num_beams=3,
                                     prompt_ids=pids))
    np.testing.assert_array_equal(bseqs[:, :3],
                                  np.tile(np.asarray(pids), (2, 1)))


@pytest.mark.slow
def test_caption_decode_with_gradient_checkpointing(tmp_path):
    """KV-cached decode under remat-wrapped layers: cross_from_cache is a
    python bool branched on inside SelfAttention and must stay static
    through nn.remat (round-2 review: threaded as a dynamic kwarg it raised
    TracerBoolConversionError on every decode step after the first)."""
    import jax
    import jax.numpy as jnp

    from xfm_tpu.data.tokenization import SimpleTokenizer
    from xfm_tpu.models.generation import generate
    from xfm_tpu.tasks.captioning import build_model

    tok = SimpleTokenizer.from_texts(["one two three"])
    cfg = dict(tiny_model_keys(), num_dec_layers=2,
               decoder_fusion_start_at=0, image_res=32, max_length=6,
               gradient_checkpointing=True)
    model, _ = build_model(cfg, tok)
    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        images=images,
                        text_ids=jnp.ones((2, 6), jnp.int32),
                        text_atts=jnp.ones((2, 6), jnp.int32),
                        method=model.init_all)["params"]
    seqs, _ = generate(model, {"params": params}, images, bos_id=1,
                       eos_id=2, pad_id=0, max_len=6, greedy=True)
    assert np.asarray(seqs).shape == (2, 6)

    # training step under remat still differentiates
    def loss(p):
        return model.apply({"params": p}, images,
                           jnp.ones((2, 6), jnp.int32),
                           jnp.ones((2, 6), jnp.int32), train=True)

    g = jax.grad(loss)(params)
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda x: bool(jnp.all(jnp.isfinite(x))), g))
