"""Golden-logit parity against the reference implementation.

Fixtures in tests/fixtures/ hold {state_dict, inputs, outputs} produced by
running the reference's own torch modules (scripts/make_golden_fixtures.py;
SURVEY.md §4.1). These tests import the state dicts through the checkpoint
importer and check our Flax modules reproduce the reference logits — true
code-vs-code numerical parity, independent of HF."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def load_fixture(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated")
    z = np.load(path)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    rest = {k: z[k] for k in z.files if not k.startswith("sd::")}
    return sd, rest


def test_beit2_forward_matches_reference():
    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig
    from xfm_tpu.train.checkpoint import import_beit2, merge_params, to_jax

    sd, io = load_fixture("golden_beit2.npz")
    cfg = VisionConfig(image_res=64, patch_size=16, embed_dim=96, depth=3,
                       num_heads=4, drop_path_rate=0.0, init_values=0.1,
                       use_rel_pos_bias=True, use_abs_pos_emb=False,
                       use_mean_pooling=True)
    m = BeitVisionTransformer(cfg)
    images = jnp.asarray(io["images"].transpose(0, 2, 3, 1))  # NCHW→NHWC
    init = m.init(jax.random.PRNGKey(0), images)["params"]
    imported = to_jax(import_beit2(sd, cfg))
    params, missing, unexpected = merge_params(init, imported)
    assert not missing, missing

    out = m.apply({"params": params}, images)
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=2e-4,
                               rtol=1e-3)


def test_xroberta_forward_matches_reference():
    from xfm_tpu.models.text_encoder import TextConfig, TextTransformer
    from xfm_tpu.train.checkpoint import (import_text_encoder, merge_params,
                                          strip_prefix, to_jax)

    sd, io = load_fixture("golden_xroberta.npz")
    cfg = TextConfig(vocab_size=99, hidden_size=48, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=96,
                     max_position_embeddings=40, fusion_layer=2,
                     encoder_width=96, pad_token_id=1,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    m = TextTransformer(cfg, with_mlm=True)
    ids = jnp.asarray(io["ids"], jnp.int32)
    atts = jnp.asarray(io["atts"], jnp.int32)
    enc = jnp.asarray(io["enc"])
    init = m.init(jax.random.PRNGKey(0), ids, attention_mask=atts,
                  encoder_hidden_states=enc,
                  method=TextTransformer.init_all)["params"]
    # lm_head.* keys live at the top level, roberta.* under the prefix
    flat = dict(strip_prefix(sd, "roberta."))
    flat.update({k: v for k, v in sd.items() if k.startswith("lm_head.")})
    imported = to_jax(import_text_encoder(flat, cfg, with_mlm=True))
    params, missing, unexpected = merge_params(init, imported)
    assert not missing, missing

    # text-only mode (layers [0, fusion_layer))
    text_out = m.apply({"params": params}, ids, attention_mask=atts,
                       mode="text")
    np.testing.assert_allclose(np.asarray(text_out), io["text_out"],
                               atol=2e-4, rtol=1e-3)

    # full multimodal pass + tied MLM head
    hidden = m.apply({"params": params}, ids, attention_mask=atts,
                     encoder_hidden_states=enc, mode="multi_modal")
    logits = m.apply({"params": params}, hidden, None,
                     method=TextTransformer.mlm_logits)
    np.testing.assert_allclose(np.asarray(logits), io["mlm_logits"],
                               atol=5e-4, rtol=1e-3)


def _xfm_losses_config():
    from xfm_tpu.models.beit2 import VisionConfig
    from xfm_tpu.models.text_encoder import TextConfig
    from xfm_tpu.models.xfm import XFMConfig

    vis = VisionConfig(image_res=64, patch_size=16, embed_dim=96, depth=3,
                       num_heads=4, drop_path_rate=0.0, init_values=0.1,
                       use_rel_pos_bias=True, use_abs_pos_emb=False,
                       use_mean_pooling=True)
    kw = dict(vocab_size=99, hidden_size=48, num_hidden_layers=4,
              num_attention_heads=4, intermediate_size=96,
              max_position_embeddings=40, encoder_width=96, pad_token_id=1,
              hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
              layer_norm_eps=1e-5, position_style="roberta")
    text = TextConfig(fusion_layer=4, **kw)
    fusion = TextConfig(**{**kw, "num_hidden_layers": 2, "fusion_layer": 0})
    return XFMConfig(vision=vis, text=text, fusion=fusion, embed_dim=32,
                     temp=0.07, use_contrastive_loss=True,
                     use_matching_loss=True, use_mlm_loss=True,
                     use_bbox_loss=True)


@pytest.mark.slow
def test_xfm_loss_values_match_reference():
    """Loss-level golden parity: ITC (plain + idx soft labels), ITM with the
    reference's recorded hard negatives, fusion-MLM, MIM MSE, bbox L1+GIoU
    (reference models/xfm.py:624-840) — parity one level above single-tower
    logits."""
    from xfm_tpu.models.xfm import XFMBase
    from xfm_tpu.train.checkpoint import (import_xfm_checkpoint,
                                          merge_params, to_jax)

    sd, io = load_fixture("golden_xfm_losses.npz")
    cfg = _xfm_losses_config()
    model = XFMBase(cfg)
    images = jnp.asarray(io["image"].transpose(0, 2, 3, 1))  # NCHW→NHWC
    ids = jnp.asarray(io["ids"], jnp.int32)
    atts = jnp.asarray(io["atts"], jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, images, ids, atts,
                      method=XFMBase.init_all)["params"]
    # import_xfm_checkpoint targets task-head trees ({'backbone': ...});
    # bare XFMBase params are the backbone subtree
    imported = to_jax(import_xfm_checkpoint(sd, cfg))["backbone"]
    params, missing, _ = merge_params(init, imported)
    assert not missing, missing

    mask = jnp.asarray(io["mask"])
    neg = (jnp.asarray(io["image_neg"], jnp.int32),
           jnp.asarray(io["text_neg"], jnp.int32))

    def compute(m):
        image_embeds = m.get_vision_embeds(images)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        embeds_masked = m.get_vision_embeds(images, mask=mask)
        text_embeds = m.get_text_embeds(ids, atts)
        image_feat, text_feat = m.get_features(image_embeds, text_embeds)
        out = {
            "loss_itc": m.get_contrastive_loss(image_feat, text_feat),
            "loss_itc_idx": m.get_contrastive_loss(
                image_feat, text_feat, idx=jnp.asarray(io["idx"], jnp.int32)),
            "loss_itm": m.get_matching_loss(
                jax.random.PRNGKey(0), image_embeds, image_atts, image_feat,
                ids, atts, text_feat, text_embeds=text_embeds,
                is_pretrain=True, fixed_negatives=neg),
            "loss_mlm": m.get_fuse_mlm_loss(
                jnp.asarray(io["ids_masked"], jnp.int32), atts, image_embeds,
                image_atts, jnp.asarray(io["masked_pos"], jnp.int32),
                jnp.asarray(io["masked_ids"], jnp.int32)),
            "loss_mim": m.get_mim_loss(embeds_masked, image_embeds, mask),
        }
        coords = m.predict_bbox(image_embeds, text_atts=atts,
                                text_embeds=text_embeds)
        lb, lg = m.get_bbox_loss(coords,
                                 jnp.asarray(io["target_bbox"]))
        out["loss_bbox"], out["loss_giou"] = lb, lg
        out["coords"] = coords
        return out

    got = model.apply({"params": params}, method=compute)
    for k in ("loss_itc", "loss_itc_idx", "loss_itm", "loss_mlm",
              "loss_mim", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(got[k]), float(io[k]), rtol=2e-3,
                                   atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(got["coords"]), io["coords"],
                               atol=2e-4, rtol=1e-3)


def test_greedy_decode_matches_reference():
    """Decode-level golden parity: our KV-cached scan decoder reproduces the
    reference causal decoder's greedy sequence and per-step logits
    (reference models/xroberta.py:963-1153 RobertaForCausalLM with
    past_key_values)."""
    from xfm_tpu.models.text_encoder import TextConfig, TextTransformer
    from xfm_tpu.train.checkpoint import (import_text_encoder, merge_params,
                                          strip_prefix, to_jax)

    sd, io = load_fixture("golden_decode.npz")
    cfg = TextConfig(vocab_size=99, hidden_size=48, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=96,
                     max_position_embeddings=40, fusion_layer=0,
                     encoder_width=96, pad_token_id=1,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5,
                     is_decoder=True, decode_cache_len=12)
    m = TextTransformer(cfg, with_mlm=True)
    enc = jnp.asarray(io["enc"])
    enc_atts = jnp.asarray(io["enc_atts"], jnp.int32)
    B, L = io["seq"].shape[0], io["seq"].shape[1] - 1

    sub = strip_prefix(sd, "roberta.")
    sub.update({k: v for k, v in sd.items() if k.startswith("lm_head.")})
    imported = to_jax(import_text_encoder(sub, cfg, with_mlm=True))

    ids0 = jnp.zeros((B, 1), jnp.int32)
    # init_all creates the full param tree (incl. mlm_head); a second init
    # with decode=True creates the KV-cache variable structure
    full_init = m.init({"params": jax.random.PRNGKey(0)}, ids0,
                       attention_mask=jnp.ones((B, 1), jnp.int32),
                       encoder_hidden_states=enc,
                       encoder_attention_mask=enc_atts,
                       method=TextTransformer.init_all)["params"]
    variables = m.init({"params": jax.random.PRNGKey(0)}, ids0,
                       attention_mask=jnp.ones((B, 1), jnp.int32),
                       encoder_hidden_states=enc,
                       encoder_attention_mask=enc_atts, decode=True)
    params, missing, _ = merge_params(dict(full_init), imported)
    assert not missing, missing
    cache = variables["cache"]

    cur = ids0
    toks = [np.asarray(cur)]
    step_logits = []
    for t in range(L):
        hidden, mut = m.apply(
            {"params": params, "cache": cache}, cur,
            attention_mask=None, encoder_hidden_states=enc,
            encoder_attention_mask=enc_atts, decode=True, past_length=t,
            cross_from_cache=t > 0, mutable=["cache"])
        cache = mut["cache"]
        logits = m.apply({"params": params}, hidden, None,
                         method=TextTransformer.mlm_logits)[:, -1, :]
        step_logits.append(np.asarray(logits))
        cur = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
        toks.append(np.asarray(cur))
    seq = np.concatenate(toks, axis=1)
    np.testing.assert_array_equal(seq, io["seq"])
    np.testing.assert_allclose(np.stack(step_logits, axis=1),
                               io["step_logits"], atol=5e-4, rtol=1e-3)


def test_clip_vit_forward_matches_reference():
    """CLIP-ViT tower vs reference models/clip_vit.py:310-360 (quick_gelu,
    pre-LN blocks, post_layernorm over all tokens)."""
    from xfm_tpu.models.clip_vit import ClipVisionConfig, ClipVisionTransformer
    from xfm_tpu.train.checkpoint import import_clip_vit, merge_params, to_jax

    sd, io = load_fixture("golden_clip_vit.npz")
    cfg = ClipVisionConfig(image_res=32, patch_size=8, hidden_size=24,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=48, hidden_act="quick_gelu")
    m = ClipVisionTransformer(cfg)
    images = jnp.asarray(io["images"].transpose(0, 2, 3, 1))
    init = m.init(jax.random.PRNGKey(0), images)["params"]
    params, missing, _ = merge_params(init, to_jax(import_clip_vit(sd, cfg)))
    assert not missing, missing
    out = m.apply({"params": params}, images)
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=2e-4,
                               rtol=1e-3)


def test_swin_forward_matches_reference():
    """Swin tower vs reference models/swin_transformer.py:460-583 — tiny
    2-stage config with an actually-shifted block in stage 0; pins window
    partition/shift masks, rel-pos tables, patch merging, avgpool readout."""
    from xfm_tpu.models.swin import SwinConfig, SwinTransformer
    from xfm_tpu.train.checkpoint import import_swin, merge_params, to_jax

    sd, io = load_fixture("golden_swin.npz")
    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(2, 2), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0)
    m = SwinTransformer(cfg)
    images = jnp.asarray(io["images"].transpose(0, 2, 3, 1))
    init = m.init(jax.random.PRNGKey(0), images)["params"]
    params, missing, _ = merge_params(init, to_jax(import_swin(sd, cfg)))
    assert not missing, missing
    out = m.apply({"params": params}, images)
    np.testing.assert_allclose(np.asarray(out), io["out"], atol=2e-4,
                               rtol=1e-3)


def test_vqkd_tokenizer_matches_reference():
    """VQ-KD tokenizer vs reference models/model_vqkd.py encode():
    encoder -> fp32 tanh task layer -> NormEMA nearest-code assignment.
    Pins the pre-quantizer z, the code ids, and the quantized vectors."""
    from xfm_tpu.models.vqkd import VQKD, vqkd_config_from_yaml
    from xfm_tpu.train.checkpoint import (import_vqkd_checkpoint,
                                          merge_params, to_jax)

    sd, io = load_fixture("golden_vqkd.npz")
    cfg = vqkd_config_from_yaml(
        {"tokenizer_model": "vqkd_encoder_base_decoder_1x768x12_clip",
         "image_res": 32, "patch_size": 16, "tokenizer_embed_dim": 32,
         "tokenizer_depth": 1, "tokenizer_num_heads": 2,
         "codebook_size": 16, "codebook_dim": 8})
    m = VQKD(cfg)
    images = jnp.asarray(io["images"].transpose(0, 2, 3, 1))
    vars0 = m.init({"params": jax.random.PRNGKey(0)}, images,
                   method=VQKD.get_codebook_indices)
    imported = to_jax(import_vqkd_checkpoint(sd, cfg))
    params, missing, _ = merge_params(dict(vars0["params"]),
                                      imported["params"])
    assert not [k for k in missing if "decoder" not in k
                and "mask_token" not in k], missing
    variables = {"params": params, "vq_stats": imported["vq_stats"]}

    z = m.apply(variables, images, method=VQKD._encode_z)
    np.testing.assert_allclose(np.asarray(z), io["z"], atol=2e-4, rtol=1e-3)

    ids = m.apply(variables, images, method=VQKD.get_codebook_indices)
    np.testing.assert_array_equal(np.asarray(ids), io["ids"])
