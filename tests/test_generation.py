"""Generation stack tests: KV-cached decoding vs full forward, VQA ranking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xfm_tpu.models import (TextConfig, VisionConfig, XFMConfig,
                            XFMForCaptioning, XFMForVQA, beam_generate,
                            generate)


def tiny_cfg(decoder_layers=2):
    vis = VisionConfig(image_res=32, patch_size=16, embed_dim=32, depth=1,
                       num_heads=2, drop_path_rate=0.0)
    txt = TextConfig.roberta_base(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=64, vocab_size=100,
                                  fusion_layer=2, encoder_width=32,
                                  max_position_embeddings=64)
    fus = TextConfig.roberta_base(hidden_size=32, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=64, vocab_size=100,
                                  fusion_layer=0, encoder_width=32,
                                  max_position_embeddings=64)
    return XFMConfig(vision=vis, text=txt, fusion=fus, embed_dim=16)


@pytest.mark.slow
def test_caption_train_loss_and_greedy_decode_consistency():
    cfg = tiny_cfg()
    model = XFMForCaptioning(cfg, num_dec_layers=2, pad_token_id=1)
    B, L = 2, 6
    images = jnp.ones((B, 32, 32, 3))
    ids = jnp.asarray(np.random.RandomState(0).randint(4, 99, (B, L)),
                      jnp.int32)
    atts = jnp.ones((B, L), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, ids, atts,
                           method=XFMForCaptioning.init_all)
    loss = model.apply(variables, images, ids, atts, train=True)
    assert np.isfinite(float(loss))

    # KV-cached decoding must match teacher-forced logits on the same prefix
    seqs, logps = generate(model, variables, images, bos_id=1, eos_id=2,
                           pad_id=1, max_len=5, greedy=True)
    assert seqs.shape == (B, 5) and logps.shape == (B, 5)

    # teacher-forced check: feed [bos, seqs[:, :-1]] through the full
    # decoder; argmax at each position must reproduce the greedy tokens
    # until eos.
    prefix = jnp.concatenate([jnp.full((B, 1), 1, jnp.int32),
                              seqs[:, :-1]], axis=1)
    logits = model.apply(variables, images, prefix,
                         jnp.ones_like(prefix), train=False)
    preds = np.asarray(jnp.argmax(logits, -1))
    got = np.asarray(seqs)
    for b in range(B):
        for t in range(5):
            np.testing.assert_equal(preds[b, t], got[b, t])
            if got[b, t] == 2:  # eos
                break


def test_caption_sampling_logprobs():
    cfg = tiny_cfg()
    model = XFMForCaptioning(cfg, num_dec_layers=2, pad_token_id=1)
    images = jnp.ones((1, 32, 32, 3))
    ids = jnp.ones((1, 4), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0), images, ids,
                           jnp.ones_like(ids),
                           method=XFMForCaptioning.init_all)
    seqs, logps = generate(model, variables, images, bos_id=1, eos_id=2,
                           pad_id=1, max_len=6, greedy=False,
                           rng=jax.random.PRNGKey(7),
                           num_return_sequences=3)
    assert seqs.shape == (3, 6)
    assert np.all(np.asarray(logps) <= 0.0)


@pytest.mark.slow
def test_beam_search_beats_or_matches_greedy():
    cfg = tiny_cfg()
    model = XFMForCaptioning(cfg, num_dec_layers=2, pad_token_id=1)
    B = 2
    images = jax.random.normal(jax.random.PRNGKey(3), (B, 32, 32, 3))
    ids = jnp.ones((B, 4), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0), images, ids,
                           jnp.ones_like(ids),
                           method=XFMForCaptioning.init_all)
    beams = beam_generate(model, variables, images, bos_id=1, eos_id=2,
                          pad_id=1, max_len=5, num_beams=3)
    assert beams.shape == (B, 5)
    greedy, glp = generate(model, variables, images, bos_id=1, eos_id=2,
                           pad_id=1, max_len=5, greedy=True)

    # beam-1 must equal greedy
    beam1 = beam_generate(model, variables, images, bos_id=1, eos_id=2,
                          pad_id=1, max_len=5, num_beams=1,
                          length_penalty=0.0)
    np.testing.assert_array_equal(np.asarray(beam1), np.asarray(greedy))


@pytest.mark.slow
def test_vqa_train_and_rank():
    cfg = tiny_cfg()
    model = XFMForVQA(cfg, num_dec_layers=2, pad_token_id=1)
    B, Lq, La, NA = 2, 5, 4, 6
    r = np.random.RandomState(0)
    images = jnp.ones((B, 32, 32, 3))
    q_ids = jnp.asarray(r.randint(4, 99, (B, Lq)), jnp.int32)
    q_atts = jnp.ones((B, Lq), jnp.int32)
    # flat answers: 3 for q0, 2 for q1 → 5 total (padded to 6 w/ weight 0)
    ans = jnp.asarray(r.randint(4, 99, (NA, La)), jnp.int32)
    ans = ans.at[:, 0].set(1)  # bos
    ques_idx = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    weights = jnp.asarray([0.5, 0.3, 0.2, 0.7, 0.3, 0.0], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, q_ids, q_atts,
                           method=XFMForVQA.init_all)
    loss = model.apply(variables, images, q_ids, q_atts, answer_ids=ans,
                       answer_atts=jnp.ones_like(ans), ques_idx=ques_idx,
                       weights=weights, train=True)
    assert np.isfinite(float(loss))

    # ranking over an answer list of 6, k=3
    topk_ids, topk_probs = model.apply(
        variables, images, q_ids, q_atts, train=False,
        answer_list_ids=ans, answer_list_atts=jnp.ones_like(ans), k=3)
    assert topk_ids.shape == (B, 3)
    p = np.asarray(topk_probs)
    assert np.all(p[:, 0] >= p[:, 1]) and np.all(p >= 0)
    assert np.all(np.asarray(topk_ids) < NA)


def test_min_length_suppresses_early_eos():
    """min_len (reference HF generate min_length,
    configs/xfm-ft/Captioning.yaml:33): EOS must not appear while
    cur_len (incl. bos) < min_length, in both greedy and beam decoding."""
    cfg = tiny_cfg()
    model = XFMForCaptioning(cfg, num_dec_layers=2, pad_token_id=1)
    B = 2
    images = jnp.ones((B, 32, 32, 3))
    ids = jnp.ones((B, 4), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0), images, ids,
                           jnp.ones_like(ids),
                           method=XFMForCaptioning.init_all)

    # pick a seed model state where unconstrained decode emits eos early:
    # force it by checking the constrained decode instead — no token in
    # positions [0, min_len-1) may be eos (position p has cur_len p+1).
    for decode in ("greedy", "beam"):
        if decode == "greedy":
            seqs, _ = generate(model, variables, images, bos_id=1, eos_id=2,
                               pad_id=1, max_len=8, min_len=6, greedy=True)
        else:
            seqs = beam_generate(model, variables, images, bos_id=1,
                                 eos_id=2, pad_id=1, max_len=8, min_len=6,
                                 num_beams=2)
        s = np.asarray(seqs)
        # cur_len at generated position p is p+1 (bos included) — eos
        # blocked while p+1 < 6
        assert not (s[:, :5] == 2).any(), (decode, s)


def test_generate_captions_beam_path(tmp_path):
    """tasks.captioning.generate_captions dispatches to beam search when
    num_beams > 1 (reference Captioning.py:86 evaluates with beams)."""
    import json
    from PIL import Image
    from xfm_tpu.data.finetune_data import CaptioningData
    from xfm_tpu.data.transforms import TestTransform
    from xfm_tpu.tasks.captioning import generate_captions
    from xfm_tpu.tasks.retrieval import build_tokenizer_or_fallback

    rng = np.random.RandomState(0)
    val = []
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            tmp_path / f"i{i}.jpg")
        val.append({"image": f"i{i}.jpg", "caption": ["a thing"],
                    "image_id": i})
    (tmp_path / "val.json").write_text(json.dumps(val))
    tok = build_tokenizer_or_fallback({"text_encoder": "roberta-base"})
    data = CaptioningData(str(tmp_path / "val.json"), TestTransform(32),
                          str(tmp_path), tok, batch_size=2, train=False)

    cfg = tiny_cfg()
    model = XFMForCaptioning(cfg, num_dec_layers=2, pad_token_id=1,
                             max_decode_len=8)
    images = jnp.ones((2, 32, 32, 3))
    ids = jnp.ones((2, 4), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0), images, ids,
                           jnp.ones_like(ids),
                           method=XFMForCaptioning.init_all)
    out = generate_captions(model, variables, data, tok, max_len=6,
                            min_len=2, num_beams=2)
    assert len(out) == 2 and all("caption" in r for r in out)


def test_rank_answer_shared_kv_matches_repeat(monkeypatch):
    """rank_answer's unique-question cross-k/v path (encoder_row_idx; eval
    shared-KV, VERDICT r3 #2) is numerically identical to the reference's
    repeat-the-question formulation (model_generation.py:174-178)."""
    cfg = tiny_cfg()
    model = XFMForVQA(cfg, num_dec_layers=2, pad_token_id=1)
    B, Lq, La, NA = 2, 5, 4, 6
    r = np.random.RandomState(3)
    images = jnp.asarray(r.randn(B, 32, 32, 3), jnp.float32)
    q_ids = jnp.asarray(r.randint(4, 99, (B, Lq)), jnp.int32)
    q_atts = jnp.ones((B, Lq), jnp.int32)
    ans = jnp.asarray(r.randint(4, 99, (NA, La)), jnp.int32).at[:, 0].set(1)
    variables = model.init(jax.random.PRNGKey(0), images, q_ids, q_atts,
                           method=XFMForVQA.init_all)

    def rank():
        return model.apply(variables, images, q_ids, q_atts, train=False,
                           answer_list_ids=ans,
                           answer_list_atts=jnp.ones_like(ans), k=3)

    monkeypatch.setenv("XFM_EVAL_SHARED_KV", "0")
    ids0, probs0 = rank()
    monkeypatch.setenv("XFM_EVAL_SHARED_KV", "1")
    ids1, probs1 = rank()
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_allclose(np.asarray(probs0), np.asarray(probs1),
                               atol=1e-6, rtol=1e-5)
    # round-5 grouped-batch default: per-question candidate groups viewed
    # against once-projected k/v (no per-row gather)
    monkeypatch.setenv("XFM_EVAL_SHARED_KV", "2")
    ids2, probs2 = rank()
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids2))
    np.testing.assert_allclose(np.asarray(probs0), np.asarray(probs2),
                               atol=1e-6, rtol=1e-5)


def test_itm_scores_row_idx_matches_repeat():
    """Retrieval rerank i2t: itm_scores(image_row_idx=...) over unique
    images equals itm_scores over the repeated-image tensor."""
    import dataclasses

    from xfm_tpu.models.task_models import XFMForRetrieval

    cfg = dataclasses.replace(tiny_cfg(), use_contrastive_loss=True,
                              use_matching_loss=True)
    model = XFMForRetrieval(cfg)
    U, K, T = 2, 3, 5
    r = np.random.RandomState(5)
    images = jnp.asarray(r.randn(U, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(r.randint(4, 99, (U, T)), jnp.int32)
    atts = jnp.ones((U, T), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                        atts, method=XFMForRetrieval.init_all)["params"]
    Nv = cfg.vision.num_patches + 1
    img_embeds = jnp.asarray(r.randn(U, Nv, 32), jnp.float32)
    txt_embeds = jnp.asarray(r.randn(U * K, T, 32), jnp.float32)
    txt_atts = jnp.ones((U * K, T), jnp.int32)
    row_idx = jnp.repeat(jnp.arange(U, dtype=jnp.int32), K)

    s_rep = model.apply({"params": params},
                        jnp.repeat(img_embeds, K, axis=0), txt_embeds,
                        txt_atts, method=XFMForRetrieval.itm_scores)
    s_idx = model.apply({"params": params}, img_embeds, txt_embeds,
                        txt_atts, image_row_idx=row_idx,
                        method=XFMForRetrieval.itm_scores)
    np.testing.assert_allclose(np.asarray(s_rep), np.asarray(s_idx),
                               atol=1e-5, rtol=1e-5)
