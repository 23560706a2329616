"""Multi-stream pretraining e2e smoke (reference Pretrain.py flow):
image-text + text-only streams, a few jitted steps, checkpoint written.
Variants cover the scan-stepped dispatch (`dispatch_steps`) and the
bf16-live-params/fp32-master path (`bf16_params`)."""
import base64
import io
import json
import os
import types

import numpy as np
import pytest
import yaml
from PIL import Image


def _write_streams(tmp_path):
    rng = np.random.default_rng(0)
    with open(tmp_path / "pairs.jsonl", "w") as f:
        for i in range(16):
            arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            f.write(json.dumps({"binary": b64,
                                "desc": f"an image number {i}"}) + "\n")
    with open(tmp_path / "texts.jsonl", "w") as f:
        for i in range(32):
            f.write(json.dumps({"desc": f"plain text line {i} with several "
                                        f"words to mask"}) + "\n")


def _base_cfg(tmp_path):
    return dict(
        text_encoder="roberta-base", text_num_hidden_layers=2,
        text_fusion_start_at=2, fusion_num_hidden_layers=2,
        fusion_fusion_start_at=0, text_hidden_size=32,
        text_num_attention_heads=2, text_intermediate_size=64,
        image_res=32, patch_size=16, vision_embed_dim=32, vision_depth=1,
        vision_num_heads=2, embed_dim=16,
        train_file=[str(tmp_path / "pairs.jsonl")],
        train_file_text=[str(tmp_path / "texts.jsonl")],
        images={"image_key": "binary", "is_image_rpath": False,
                "caption_key": "desc", "batch_size": 8},
        texts={"text_key": "desc", "batch_size": 8, "max_words": 16,
               "max_tokens": 16, "max_masks": 3, "mask_prob": 0.15,
               "mask_whole_word": False},
        max_words=10, max_tokens=12, mask_prob=0.5, max_masks=3,
        num_masking_patches=2, min_num_patches=1,
        train_dataset_size=16, max_steps=3, ckpt_frequent_step=3,
        print_freq=1,
        schedular={"sched": "linear", "lr": 1e-4, "epochs": 1,
                   "num_warmup_steps": 1},
        optimizer={"lr": 1e-4, "weight_decay": 0.01, "lr_mult": 2},
        use_mm_mim_loss=True,
    )


def _run(tmp_path, extra_cfg=None):
    _write_streams(tmp_path)
    cfg = _base_cfg(tmp_path)
    cfg.update(extra_cfg or {})
    cfg_path = tmp_path / "pt.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from xfm_tpu.tasks import pretrain

    args = types.SimpleNamespace(config=str(cfg_path),
                                 output_dir=str(tmp_path / "out"),
                                 checkpoint=None, evaluate=False, bs=None,
                                 epoch=None, seed=0)
    return pretrain.main(args)


@pytest.mark.slow
def test_pretrain_two_streams(tmp_path):
    stats = _run(tmp_path)
    # both streams contributed losses
    assert stats.get("image_loss_itc", 0) > 0
    assert stats.get("text_loss_mlm", 0) > 0
    assert os.path.isdir(tmp_path / "out" / "ckpt")
    assert os.path.exists(tmp_path / "out" / "log.txt")


@pytest.mark.slow
def test_pretrain_dispatch_steps_scan(tmp_path):
    """K=2 steps per dispatch (scan) with the text stream stepped separately
    — both scanned paths — plus bf16 live params with fp32 master."""
    stats = _run(tmp_path, dict(dispatch_steps=2, max_steps=4,
                                ckpt_frequent_step=4,
                                text_step_separate=True, bf16_params=True))
    assert stats.get("image_loss_itc", 0) > 0
    assert stats.get("text_loss_mlm", 0) > 0
    assert np.isfinite(stats.get("loss", np.inf))
    assert os.path.isdir(tmp_path / "out" / "ckpt")


@pytest.mark.slow
def test_pretrain_native_device_randaug(tmp_path):
    """`num_workers` > 0 routes the image stream through the C++ loader with
    RandAugment deferred to device (data/device_aug.randaugment_batch inside
    the jitted step): batches arrive uint8 un-augmented, training still
    converges to finite losses."""
    from xfm_tpu import native

    if not native.available():
        pytest.skip("native loader unavailable")
    stats = _run(tmp_path, dict(
        images={"image_key": "binary", "is_image_rpath": False,
                "caption_key": "desc", "batch_size": 8, "num_workers": 2,
                "device_randaug": True}))
    assert stats.get("image_loss_itc", 0) > 0
    assert np.isfinite(stats.get("loss", np.inf))


@pytest.mark.slow
def test_pretrain_vqkd_tokenizer_mim(tmp_path):
    """`use_vision_tokenizer: true` end-to-end: the pretrain task builds the
    frozen VQ-KD tokenizer, computes code ids per image batch, and MIM takes
    the CE branch (reference models/xfm.py:104-112,625-629)."""
    stats = _run(tmp_path, dict(
        use_vision_tokenizer=True,
        tokenizer_model="vqkd_encoder_base_decoder_1x768x12_clip",
        tokenizer_embed_dim=32, tokenizer_depth=1, tokenizer_num_heads=2,
        codebook_size=32, codebook_dim=8, max_steps=2, ckpt_frequent_step=2))
    assert stats.get("image_loss_mim", 0) > 0
    # CE over a 32-code codebook at random init ≈ ln(32); MSE MIM would not
    # sit in this range
    assert 1.0 < stats["image_loss_mim"] < 6.0
