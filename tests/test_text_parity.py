"""Numerical parity of TextTransformer vs HuggingFace RoBERTa/BERT (torch).

This is the SURVEY.md §4.1 golden-fixture strategy: the reference text/fusion
encoders are thin forks of HF BERT/RoBERTa (reference models/xroberta.py:1-60),
so matching vanilla HF on shared weights validates embeddings (pad-offset
position ids), attention, post-LN residuals and the MLM head bit-for-bit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xfm_tpu.models.text_encoder import TextConfig, TextTransformer
from xfm_tpu.train.checkpoint import import_text_encoder, merge_params, to_jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_hf_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_act="gelu")
    torch.manual_seed(0)
    return transformers.RobertaModel(cfg, add_pooling_layer=False), cfg


def make_inputs(pad=1):
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 119, size=(2, 9)).astype(np.int64)
    ids[0, 6:] = pad  # padded tail exercises pad-offset position ids
    atts = (ids != pad).astype(np.int64)
    return ids, atts


@pytest.mark.slow
def test_roberta_parity():
    model, hf_cfg = tiny_hf_roberta()
    model.eval()
    ids, atts = make_inputs()
    with torch.no_grad():
        ref = model(torch.tensor(ids),
                    attention_mask=torch.tensor(atts)).last_hidden_state.numpy()

    cfg = TextConfig(vocab_size=120, hidden_size=32, num_hidden_layers=3,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=40, type_vocab_size=1,
                     pad_token_id=1, fusion_layer=3, encoder_width=32,
                     position_style="roberta")
    ours = TextTransformer(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    imported = import_text_encoder(sd, cfg)

    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     attention_mask=jnp.asarray(atts))
    merged, missing, unexpected = merge_params(init["params"],
                                               to_jax(imported))
    assert not missing, missing
    assert not unexpected, unexpected

    out = ours.apply({"params": merged}, jnp.asarray(ids),
                     attention_mask=jnp.asarray(atts))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_cross_attention_modes():
    """fusion_layer mechanics: mode='text' must equal running only the first
    fusion_layer layers; cross-attn layers consume encoder states."""
    cfg = TextConfig(vocab_size=50, hidden_size=16, num_hidden_layers=4,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=30, pad_token_id=1,
                     fusion_layer=2, encoder_width=24)
    m = TextTransformer(cfg)
    ids = jnp.array([[5, 6, 7, 1]])
    atts = jnp.array([[1, 1, 1, 0]])
    enc = jnp.ones((1, 5, 24))
    params = m.init(jax.random.PRNGKey(0), ids, attention_mask=atts,
                    encoder_hidden_states=enc)

    full = m.apply(params, ids, attention_mask=atts,
                   encoder_hidden_states=enc, mode="multi_modal")
    txt = m.apply(params, ids, attention_mask=atts, mode="text")
    fused = m.apply(params, txt, inputs_embeds=txt, attention_mask=atts,
                    encoder_hidden_states=enc, mode="fusion")
    np.testing.assert_allclose(np.asarray(full), np.asarray(fused), atol=1e-5)

    # layers ≥ fusion_layer have crossattention params, earlier ones don't
    p = params["params"]
    assert "crossattention" not in p["layer_0"]
    assert "crossattention" in p["layer_2"]
    k = p["layer_2"]["crossattention"]["key"]["kernel"]
    assert k.shape == (24, 16)


def test_mlm_head_gather():
    cfg = TextConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=30, pad_token_id=1,
                     fusion_layer=2, encoder_width=16)
    m = TextTransformer(cfg, with_mlm=True)
    ids = jnp.array([[5, 6, 7, 8]])
    atts = jnp.ones_like(ids)
    params = m.init(jax.random.PRNGKey(0), ids, attention_mask=atts,
                    method=TextTransformer.init_all)
    hidden = m.apply(params, ids, attention_mask=atts)
    masked_pos = jnp.array([[1, 3]])
    logits = m.apply(params, hidden, masked_pos,
                     method=TextTransformer.mlm_logits)
    assert logits.shape == (1, 2, 50)
    # gather picks the right rows
    full = m.apply(params, hidden, None, method=TextTransformer.mlm_logits)
    np.testing.assert_allclose(np.asarray(logits[0, 0]),
                               np.asarray(full[0, 1]), atol=1e-6)
