"""Checkpoint-translation tests (SURVEY.md §4.2): synthetic reference-style
torch state dicts → Flax param tree, exercising every rename rule the
importer implements (reference models/xfm.py:26-78,408-468 naming)."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xfm_tpu.models import (TextConfig, VisionConfig, XFMConfig,
                            XFMForPretrain)
from xfm_tpu.train.checkpoint import (import_xfm_checkpoint, merge_params,
                                      to_jax, interpolate_abs_pos_embed,
                                      interpolate_rel_pos_bias_table)
from xfm_tpu.models.beit2 import num_relative_distance


def tiny_cfg():
    vis = VisionConfig(image_res=32, patch_size=16, embed_dim=24, depth=2,
                       num_heads=2, drop_path_rate=0.0)
    txt = TextConfig.roberta_base(hidden_size=24, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=48, vocab_size=60,
                                  max_position_embeddings=30,
                                  fusion_layer=2, encoder_width=24)
    fus = TextConfig.roberta_base(hidden_size=24, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=48, vocab_size=60,
                                  max_position_embeddings=30,
                                  fusion_layer=0, encoder_width=24)
    return XFMConfig(vision=vis, text=txt, fusion=fus, embed_dim=12,
                     use_contrastive_loss=True, use_matching_loss=True,
                     use_mlm_loss=True, use_bbox_loss=True)


def fake_text_sd(prefix, cfg: TextConfig, cross_layers, rng):
    """Reference RobertaForMaskedLM naming: <prefix>.roberta.* + <prefix>.lm_head.*"""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = rng.randn(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32)

    r = f"{prefix}.roberta"
    sd[f"{r}.embeddings.word_embeddings.weight"] = rng.randn(v, h).astype(np.float32)
    sd[f"{r}.embeddings.position_embeddings.weight"] = rng.randn(
        cfg.max_position_embeddings, h).astype(np.float32)
    sd[f"{r}.embeddings.token_type_embeddings.weight"] = rng.randn(
        cfg.type_vocab_size, h).astype(np.float32)
    ln(f"{r}.embeddings.LayerNorm", h)
    for li in range(cfg.num_hidden_layers):
        b = f"{r}.encoder.layer.{li}"
        for qkv in ("query", "key", "value"):
            lin(f"{b}.attention.self.{qkv}", h, h)
        lin(f"{b}.attention.output.dense", h, h)
        ln(f"{b}.attention.output.LayerNorm", h)
        if li in cross_layers:
            for qkv, din in (("query", h), ("key", cfg.encoder_width),
                             ("value", cfg.encoder_width)):
                lin(f"{b}.crossattention.self.{qkv}", din, h)
            lin(f"{b}.crossattention.output.dense", h, h)
            ln(f"{b}.crossattention.output.LayerNorm", h)
        lin(f"{b}.intermediate.dense", h, i)
        lin(f"{b}.output.dense", i, h)
        ln(f"{b}.output.LayerNorm", h)
    lin(f"{prefix}.lm_head.dense", h, h)
    ln(f"{prefix}.lm_head.layer_norm", h)
    sd[f"{prefix}.lm_head.bias"] = rng.randn(v).astype(np.float32)
    return sd


def fake_vision_sd(cfg: VisionConfig, rng):
    h = cfg.embed_dim
    sd = {
        "vision_encoder.patch_embed.proj.weight": rng.randn(
            h, 3, cfg.patch_size, cfg.patch_size).astype(np.float32),
        "vision_encoder.patch_embed.proj.bias": rng.randn(h).astype(np.float32),
        "vision_encoder.cls_token": rng.randn(1, 1, h).astype(np.float32),
        "vision_encoder.mask_token": rng.randn(1, 1, h).astype(np.float32),
        "vision_encoder.fc_norm.weight": rng.randn(h).astype(np.float32),
        "vision_encoder.fc_norm.bias": rng.randn(h).astype(np.float32),
    }
    nrel = num_relative_distance((cfg.grid_size, cfg.grid_size))
    for i in range(cfg.depth):
        b = f"vision_encoder.blocks.{i}"
        sd[f"{b}.norm1.weight"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.norm1.bias"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.norm2.weight"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.norm2.bias"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.gamma_1"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.gamma_2"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.randn(3 * h, h).astype(np.float32)
        sd[f"{b}.attn.q_bias"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.attn.v_bias"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.randn(h, h).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.randn(h).astype(np.float32)
        sd[f"{b}.attn.relative_position_bias_table"] = rng.randn(
            nrel, cfg.num_heads).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.randn(int(h * 4), h).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.randn(int(h * 4)).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.randn(h, int(h * 4)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.randn(h).astype(np.float32)
    return sd


def fake_head_sd(rng, text_width=24, embed_dim=12):
    sd = {}
    sd["vision_proj.weight"] = rng.randn(embed_dim, 24).astype(np.float32)
    sd["vision_proj.bias"] = rng.randn(embed_dim).astype(np.float32)
    sd["text_proj.weight"] = rng.randn(embed_dim, text_width).astype(np.float32)
    sd["text_proj.bias"] = rng.randn(embed_dim).astype(np.float32)
    sd["temp"] = np.asarray([0.07], np.float32)
    for head, out in (("itm_head", 2), ("bbox_head", 4)):
        sd[f"{head}.0.weight"] = rng.randn(text_width * 2, text_width).astype(np.float32)
        sd[f"{head}.0.bias"] = rng.randn(text_width * 2).astype(np.float32)
        sd[f"{head}.1.weight"] = rng.randn(text_width * 2).astype(np.float32)
        sd[f"{head}.1.bias"] = rng.randn(text_width * 2).astype(np.float32)
        sd[f"{head}.3.weight"] = rng.randn(out, text_width * 2).astype(np.float32)
        sd[f"{head}.3.bias"] = rng.randn(out).astype(np.float32)
    return sd


@pytest.mark.slow
def test_full_xfm_import_covers_tree():
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    sd = {}
    sd.update(fake_vision_sd(cfg.vision, rng))
    sd.update(fake_text_sd("text_encoder", cfg.text, cross_layers=set(),
                           rng=rng))
    sd.update(fake_text_sd("fusion_encoder", cfg.fusion,
                           cross_layers={0, 1}, rng=rng))
    sd.update(fake_head_sd(rng))

    model = XFMForPretrain(cfg)
    batch = dict(images=jnp.ones((2, 32, 32, 3)),
                 text_ids=jnp.ones((2, 8), jnp.int32),
                 text_atts=jnp.ones((2, 8), jnp.int32))
    init = model.init({"params": jax.random.PRNGKey(0)}, batch["images"],
                      batch["text_ids"], batch["text_atts"],
                      method=XFMForPretrain.init_all)["params"]
    imported = import_xfm_checkpoint(sd, cfg)
    merged, missing, unexpected = merge_params(init, to_jax(imported))
    assert not unexpected, unexpected
    # everything except flax-only params (the tied mlm decoder has no torch
    # twin beyond lm_head.bias) must be covered
    assert not missing, missing

    # spot-check value + transpose: query kernel is torch weight.T
    q_t = sd["fusion_encoder.roberta.encoder.layer.0.attention.self.query.weight"]
    q_f = merged["backbone"]["fusion_encoder"]["layer_0"]["attention"]["query"]["kernel"]
    np.testing.assert_allclose(np.asarray(q_f), q_t.T)
    # cross k kernel comes from encoder_width
    k_f = merged["backbone"]["fusion_encoder"]["layer_0"]["crossattention"]["key"]["kernel"]
    assert k_f.shape == (24, 24)
    # patch conv folded to matmul kernel
    pk = merged["backbone"]["vision_encoder"]["patch_embed_kernel"]
    assert pk.shape == (16 * 16 * 3, 24)
    # model still runs with merged params
    out = model.apply({"params": merged}, **batch, ret_mlm=False,
                      rngs={"hardneg": jax.random.PRNGKey(1)})
    assert np.isfinite(float(out["loss_itc"]))


def test_abs_pos_interpolation():
    pos = np.random.RandomState(0).randn(1, 1 + 4, 8).astype(np.float32)
    out = interpolate_abs_pos_embed(pos, num_patches=16)
    assert out.shape == (1, 17, 8)
    # cls row untouched
    np.testing.assert_allclose(out[0, 0], pos[0, 0])


def test_rel_pos_bias_interpolation():
    src_window = (4, 4)
    dst_window = (6, 6)
    table = np.random.RandomState(0).randn(
        num_relative_distance(src_window), 3).astype(np.float32)
    out = interpolate_rel_pos_bias_table(table, dst_window)
    assert out.shape == (num_relative_distance(dst_window), 3)
    # the 3 cls distances carry over unchanged
    np.testing.assert_allclose(out[-3:], table[-3:])
    # same window → identity
    same = interpolate_rel_pos_bias_table(table, src_window)
    np.testing.assert_allclose(same, table)


def test_roundtrip_export_import():
    """params → torch sd → params is the identity (export is the inverse
    of import)."""
    from xfm_tpu.train.checkpoint import export_xfm_checkpoint

    cfg = tiny_cfg()
    model = XFMForPretrain(cfg)
    batch = dict(images=jnp.ones((2, 32, 32, 3)),
                 text_ids=jnp.ones((2, 8), jnp.int32),
                 text_atts=jnp.ones((2, 8), jnp.int32))
    init = model.init({"params": jax.random.PRNGKey(3)}, batch["images"],
                      batch["text_ids"], batch["text_atts"],
                      method=XFMForPretrain.init_all)["params"]
    sd = export_xfm_checkpoint(init, cfg)
    back = import_xfm_checkpoint(sd, cfg)
    merged, missing, unexpected = merge_params(init, to_jax(back))
    assert not missing and not unexpected, (missing, unexpected)
    import flax

    f0 = flax.traverse_util.flatten_dict(init, sep="/")
    f1 = flax.traverse_util.flatten_dict(merged, sep="/")
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]),
                                   atol=1e-6, err_msg=k)


def test_choose_layers():
    from xfm_tpu.train.checkpoint import choose_layers

    sd = {f"enc.layer.{i}.w": np.full((1,), i, np.float32)
          for i in range(24)}
    sd["other.w"] = np.zeros((1,), np.float32)
    mapper = {1: 0, 3: 1, 5: 2}  # 24L→ every other → small
    out = choose_layers(sd, "enc.layer", mapper)
    assert out["enc.layer.0.w"][0] == 1
    assert out["enc.layer.1.w"][0] == 3
    assert out["enc.layer.2.w"][0] == 5
    assert "enc.layer.3.w" not in out
    assert "other.w" in out


def test_clip_vit_import_covers_tree():
    from xfm_tpu.models.clip_vit import ClipVisionConfig, ClipVisionTransformer
    from xfm_tpu.train.checkpoint import import_clip_vit

    cfg = ClipVisionConfig(image_res=32, patch_size=16, hidden_size=24,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=48)
    rng = np.random.RandomState(0)
    sd = {
        "vision_model.embeddings.class_embedding": rng.randn(24).astype(np.float32),
        "vision_model.embeddings.patch_embedding.weight": rng.randn(
            24, 3, 16, 16).astype(np.float32),
        "vision_model.embeddings.position_embedding.weight": rng.randn(
            5, 24).astype(np.float32),
    }
    for nm in ("pre_layrnorm", "post_layernorm"):
        sd[f"vision_model.{nm}.weight"] = rng.randn(24).astype(np.float32)
        sd[f"vision_model.{nm}.bias"] = rng.randn(24).astype(np.float32)
    for i in range(2):
        b = f"vision_model.encoder.layers.{i}"
        for nm, dout, din in (("self_attn.q_proj", 24, 24),
                              ("self_attn.k_proj", 24, 24),
                              ("self_attn.v_proj", 24, 24),
                              ("self_attn.out_proj", 24, 24),
                              ("mlp.fc1", 48, 24), ("mlp.fc2", 24, 48)):
            sd[f"{b}.{nm}.weight"] = rng.randn(dout, din).astype(np.float32)
            sd[f"{b}.{nm}.bias"] = rng.randn(dout).astype(np.float32)
        for nm in ("layer_norm1", "layer_norm2"):
            sd[f"{b}.{nm}.weight"] = rng.randn(24).astype(np.float32)
            sd[f"{b}.{nm}.bias"] = rng.randn(24).astype(np.float32)

    model = ClipVisionTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    imported = import_clip_vit(sd, cfg)
    merged, missing, unexpected = merge_params(init["params"],
                                               to_jax(imported))
    assert not missing and not unexpected, (missing, unexpected)
    out = model.apply({"params": merged}, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 5, 24)


@pytest.mark.slow
def test_swin_import_covers_tree():
    from xfm_tpu.models.swin import SwinConfig, SwinTransformer
    from xfm_tpu.train.checkpoint import import_swin

    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0)
    rng = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": rng.randn(16, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(16).astype(np.float32),
        "patch_embed.norm.weight": rng.randn(16).astype(np.float32),
        "patch_embed.norm.bias": rng.randn(16).astype(np.float32),
        "norm.weight": rng.randn(32).astype(np.float32),
        "norm.bias": rng.randn(32).astype(np.float32),
    }
    for si, (depth, dim) in enumerate(((1, 16), (1, 32))):
        for bi in range(depth):
            b = f"layers.{si}.blocks.{bi}"
            sd[f"{b}.norm1.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm1.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm2.weight"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.norm2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
            sd[f"{b}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            sd[f"{b}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{b}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{b}.attn.relative_position_bias_table"] = rng.randn(
                49, cfg.num_heads[si]).astype(np.float32)  # 7x7 src window
            sd[f"{b}.mlp.fc1.weight"] = rng.randn(dim * 4, dim).astype(np.float32)
            sd[f"{b}.mlp.fc1.bias"] = rng.randn(dim * 4).astype(np.float32)
            sd[f"{b}.mlp.fc2.weight"] = rng.randn(dim, dim * 4).astype(np.float32)
            sd[f"{b}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
    sd["layers.0.downsample.norm.weight"] = rng.randn(64).astype(np.float32)
    sd["layers.0.downsample.norm.bias"] = rng.randn(64).astype(np.float32)
    sd["layers.0.downsample.reduction.weight"] = rng.randn(32, 64).astype(np.float32)

    model = SwinTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    imported = import_swin(sd, cfg)
    merged, missing, unexpected = merge_params(init["params"],
                                               to_jax(imported))
    assert not missing and not unexpected, (missing, unexpected)
    out = model.apply({"params": merged}, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 17, 32)


@pytest.mark.slow
def test_convert_checkpoint_cli(tmp_path, monkeypatch):
    """scripts/convert_checkpoint.py round trip: torch .th -> orbax -> .th."""
    import runpy
    import yaml
    import torch

    from xfm_tpu.models import XFMForPretrain, config_from_yaml
    from xfm_tpu.train.checkpoint import export_xfm_checkpoint

    ycfg = dict(image_res=32, patch_size=16, vision_embed_dim=32,
                vision_depth=2, vision_num_heads=2,
                text_encoder="roberta-base", text_num_hidden_layers=2,
                text_fusion_start_at=2, fusion_num_hidden_layers=2,
                fusion_fusion_start_at=0, text_hidden_size=32,
                text_num_attention_heads=2, text_intermediate_size=64,
                embed_dim=16, vocab_size=64)
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(ycfg, open(cfg_path, "w"))
    cfg = config_from_yaml(ycfg)

    model = XFMForPretrain(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32),
                        method=XFMForPretrain.init_all)["params"]
    sd = export_xfm_checkpoint(params, cfg)
    th = tmp_path / "ref.th"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               th)

    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "convert_checkpoint.py")
    out_ckpt = tmp_path / "jax_ckpt"
    monkeypatch.setattr("sys.argv", ["convert_checkpoint.py", "to-jax",
                                     str(th), str(out_ckpt),
                                     "--config", str(cfg_path)])
    runpy.run_path(script, run_name="__main__")
    assert os.path.isdir(out_ckpt)

    back = tmp_path / "back.th"
    monkeypatch.setattr("sys.argv", ["convert_checkpoint.py", "to-torch",
                                     str(out_ckpt), str(back),
                                     "--config", str(cfg_path)])
    runpy.run_path(script, run_name="__main__")
    sd2 = torch.load(back, map_location="cpu", weights_only=False)
    for k in sd:
        np.testing.assert_allclose(np.asarray(sd[k]),
                                   np.asarray(sd2[k]), atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_caption_domain_decoder_init_from_text_encoder(tmp_path):
    """Caption domain-pretrain copies TEXT-encoder weights (incl. lm_head)
    into the decoder (reference models/model_generation.py:219-235
    text_encoder.* → text_decoder.*); fine-tune copies fusion weights
    (reference :275,83-86)."""
    import jax
    import jax.numpy as jnp

    from xfm_tpu.models import XFMForPretrain, config_from_yaml
    from xfm_tpu.models import XFMForCaptioning
    from xfm_tpu.tasks.captioning import load_ckpt_into
    from xfm_tpu.train.checkpoint import (export_xfm_checkpoint,
                                          save_torch_checkpoint)
    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.train_state import TrainState

    ycfg = {"compute_dtype": "float32",
            "vision_embed_dim": 32, "vision_depth": 1, "vision_num_heads": 2,
            "patch_size": 16, "image_res": 32,
            "text_num_hidden_layers": 2, "fusion_num_hidden_layers": 2,
            "text_hidden_size": 32, "text_num_attention_heads": 2,
            "text_intermediate_size": 64, "text_vocab_size": 64}
    mcfg_pt = config_from_yaml(ycfg, use_contrastive_loss=True,
                               use_matching_loss=True, use_mlm_loss=True)
    pt = XFMForPretrain(mcfg_pt)
    imgs = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    atts = jnp.ones((2, 8), jnp.int32)
    pt_params = pt.init({"params": jax.random.PRNGKey(0)}, imgs, ids, atts,
                        method=XFMForPretrain.init_all)["params"]
    sd = export_xfm_checkpoint(pt_params, mcfg_pt)
    assert "text_encoder.lm_head.dense.weight" in sd
    path = str(tmp_path / "ckpt.th")
    save_torch_checkpoint(path, sd)

    mcfg = config_from_yaml(ycfg)
    cap = XFMForCaptioning(mcfg, num_dec_layers=2,
                           decoder_fusion_start_at=0, pad_token_id=1)
    cap_params = cap.init({"params": jax.random.PRNGKey(1)}, imgs, ids,
                          atts, method=XFMForCaptioning.init_all)["params"]
    state = TrainState.create(cap_params,
                              create_optimizer(cap_params, lambda s: 0.0))

    got = load_ckpt_into(state, mcfg, path, decoder_from="text")
    src = pt_params["backbone"]["text_encoder"]
    dec = got.params["text_decoder"]
    np.testing.assert_allclose(
        np.asarray(dec["embeddings"]["word_embeddings"]["embedding"]),
        np.asarray(src["embeddings"]["word_embeddings"]["embedding"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dec["mlm_head"]["dense"]["kernel"]),
        np.asarray(src["mlm_head"]["dense"]["kernel"]), atol=1e-6)

    got2 = load_ckpt_into(state, mcfg, path, decoder_from="fusion")
    fus = pt_params["backbone"]["fusion_encoder"]
    np.testing.assert_allclose(
        np.asarray(got2.params["text_decoder"]["layer_0"]["attention"]
                   ["query"]["kernel"]),
        np.asarray(fus["layer_0"]["attention"]["query"]["kernel"]),
        atol=1e-6)
