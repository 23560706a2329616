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
