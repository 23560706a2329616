"""Cross-modal generation: VQA answer ranking + captioning decoder
(reference models/model_generation.py).

TPU redesign notes:
- The reference's variable answers-per-question python loop
  (reference models/model_generation.py:110-117) becomes a flat
  [num_answers] layout with a `ques_idx` gather — static shapes under jit
  (built by data vqa_collate, reference dataset/__init__.py:202-210).
- `rank_answer` (reference models/model_generation.py:146-202) keeps the
  two-stage contract: first-token probs → top-k → full scoring → chain-rule
  re-rank, all as fixed-k tensor ops.
- Decoding runs as ONE jitted `lax.scan` over steps with the KV cache
  threaded as carry (vs the reference's per-token python loop through HF
  `generate`, reference models/xbert.py:1393-1484).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .text_encoder import (TextConfig, TextTransformer, per_sample_lm_loss)
from .xfm import XFMBase, XFMConfig


def make_decoder_config(xfm_cfg: XFMConfig, num_dec_layers: int = 12,
                        decoder_fusion_start_at: int = 0) -> TextConfig:
    """Decoder config (reference models/model_generation.py:36-45):
    cross-attends to the *fusion* output (encoder_width = text hidden)."""
    return dataclasses.replace(
        xfm_cfg.text,
        num_hidden_layers=num_dec_layers,
        fusion_layer=decoder_fusion_start_at,
        encoder_width=xfm_cfg.text.hidden_size,
        is_decoder=True,
    )


def shift_lm_loss(logits, labels, ignore_index=-100, label_smoothing=0.0):
    """Causal shift + per-sample summed loss
    (reference models/xroberta.py:1100-1114)."""
    return per_sample_lm_loss(logits[:, :-1], labels[:, 1:], ignore_index,
                              label_smoothing)


class XFMForVQA(nn.Module):
    """VQA as constrained generation (reference models/model_generation.py:23).

    Train: weighted per-answer CE over the flat answer layout.
    Eval: `rank_answer` over the fixed answer list.
    """
    config: XFMConfig
    num_dec_layers: int = 12
    decoder_fusion_start_at: int = 0
    pad_token_id: int = 1
    max_decode_len: int = 0   # KV-cache slots (0 = full position table)

    def setup(self):
        self.backbone = XFMBase(self.config)
        self.text_decoder = TextTransformer(
            dataclasses.replace(
                make_decoder_config(self.config, self.num_dec_layers,
                                    self.decoder_fusion_start_at),
                decode_cache_len=self.max_decode_len), with_mlm=True)

    def init_all(self, images, text_ids, text_atts):
        _, _, cross = self.backbone.init_all(images, text_ids, text_atts)
        h = self.text_decoder.init_all(text_ids, attention_mask=text_atts,
                                       encoder_hidden_states=cross,
                                       encoder_attention_mask=text_atts)
        return h

    def encode_question(self, images, q_ids, q_atts, deterministic=True):
        """vision → text encoder → fusion (reference
        models/model_generation.py:100-143 shared by train/eval)."""
        bb = self.backbone
        image_embeds = bb.get_vision_embeds(images,
                                            deterministic=deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = bb.get_text_embeds(q_ids, q_atts, deterministic)
        question = bb.get_cross_embeds(image_embeds, image_atts,
                                       text_embeds=text_embeds,
                                       text_atts=q_atts, is_pretrain=False,
                                       deterministic=deterministic)
        return question

    def decode_answers(self, answer_ids, answer_atts, question_states,
                       question_atts, deterministic=True,
                       question_row_idx=None, question_group_size=None):
        hidden = self.text_decoder(
            answer_ids, attention_mask=answer_atts,
            encoder_hidden_states=question_states,
            encoder_attention_mask=question_atts,
            deterministic=deterministic,
            encoder_row_idx=question_row_idx,
            encoder_group_size=question_group_size)
        return self.text_decoder.mlm_logits(hidden, None)

    def __call__(self, images, q_ids, q_atts, answer_ids=None,
                 answer_atts=None, ques_idx=None, weights=None, train=True,
                 deterministic=True, answer_list_ids=None,
                 answer_list_atts=None, k: int = 128):
        question = self.encode_question(images, q_ids, q_atts, deterministic)
        if train:
            # flat answers: gather each answer's question states
            qs = jnp.take(question, ques_idx, axis=0)
            qa = jnp.take(q_atts, ques_idx, axis=0)
            logits = self.decode_answers(answer_ids, answer_atts, qs, qa,
                                         deterministic)
            labels = jnp.where(answer_ids == self.pad_token_id, -100,
                               answer_ids)
            per = shift_lm_loss(logits, labels)
            return jnp.sum(weights * per) / images.shape[0]
        question_atts = jnp.ones(question.shape[:2], jnp.int32)
        return self.rank_answer(question, question_atts, answer_list_ids,
                                answer_list_atts, k)

    def rank_answer(self, question_states, question_atts, answer_ids,
                    answer_atts, k: int):
        """(reference models/model_generation.py:146-202). answer_ids:
        [num_answers, L] starting with BOS. Returns (topk_ids, topk_probs)
        of shape [num_ques, k]."""
        num_ques = question_states.shape[0]
        bos = answer_ids[0, 0]
        start = jnp.full((num_ques, 1), bos, jnp.int32)
        logits0 = self.decode_answers(start, None, question_states,
                                      question_atts)[:, 0, :]
        probs0 = jax.nn.softmax(logits0.astype(jnp.float32), axis=-1)
        first_tok = answer_ids[:, 1]
        prob_first = probs0[:, first_tok]              # [num_ques, num_ans]
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)

        # gather the k candidate answers per question → [num_ques*k, L].
        # question_states stays at its unique [num_ques] rows: the decoder's
        # cross k/v are projected once per question and gathered per
        # candidate row (encoder_row_idx) instead of re-projected k times
        # from a repeated tensor (reference model_generation.py:174-178
        # repeats; eval-only, so the gather backward never runs)
        cand_ids = jnp.take(answer_ids, topk_ids.reshape(-1), axis=0)
        cand_atts = jnp.take(answer_atts, topk_ids.reshape(-1), axis=0)
        mode = os.environ.get("XFM_EVAL_SHARED_KV", "2")
        if mode == "2":
            # grouped-batch (round 5, default): each question's k candidate
            # rows are contiguous — cross-attention views them per question
            # against once-projected k/v: no per-row gather at all (the
            # round-4 row-idx formulation gathered [num_ques·k, 40, H, D]
            # per layer; see PERF.md round-5 eval table)
            qa = jnp.repeat(question_atts, k, axis=0)
            logits = self.decode_answers(cand_ids, cand_atts,
                                         question_states, qa,
                                         question_group_size=k)
        elif mode == "1":  # row-idx shared-kv (round-4 default)
            row_idx = jnp.repeat(jnp.arange(num_ques, dtype=jnp.int32), k)
            qa = jnp.take(question_atts, row_idx, axis=0)
            logits = self.decode_answers(cand_ids, cand_atts,
                                         question_states, qa,
                                         question_row_idx=row_idx)
        else:  # legacy repeat formulation (A/B baseline, bench_finetune.py)
            qs = jnp.repeat(question_states, k, axis=0)
            qa = jnp.repeat(question_atts, k, axis=0)
            logits = self.decode_answers(cand_ids, cand_atts, qs, qa)
        labels = jnp.where(cand_ids == self.pad_token_id, -100, cand_ids)
        loss = shift_lm_loss(logits, labels)            # [num_ques*k]
        log_probs_sum = (jnp.log(topk_probs.reshape(-1) + 1e-30)
                         - loss).reshape(num_ques, k)
        probs = jax.nn.softmax(log_probs_sum, axis=-1)
        topk_probs2, rerank = jax.lax.top_k(probs, k)
        topk_ids2 = jnp.take_along_axis(topk_ids, rerank, axis=1)
        return topk_ids2, topk_probs2


class XFMForCaptioning(nn.Module):
    """COCO captioning (reference models/model_generation.py:256-385):
    decoder initialized from fusion weights (checkpoint importer maps
    `fusion_encoder.*` → `text_decoder.*`,
    reference models/model_generation.py:83-86,275)."""
    config: XFMConfig
    num_dec_layers: int = 12
    decoder_fusion_start_at: int = 0
    pad_token_id: int = 1
    prompt_length: int = 0  # tokens at the start excluded from the loss
    label_smoothing: float = 0.0  # (reference models/xbert.py:1190
                                  # LabelSmoothSoftmaxCEV1 path)
    max_decode_len: int = 0   # KV-cache slots (0 = full position table)

    def setup(self):
        self.backbone = XFMBase(self.config)
        dec_cfg = dataclasses.replace(
            make_decoder_config(self.config, self.num_dec_layers,
                                self.decoder_fusion_start_at),
            encoder_width=self.config.vision_width,
            decode_cache_len=self.max_decode_len)
        self.text_decoder = TextTransformer(dec_cfg, with_mlm=True)

    def init_all(self, images, text_ids, text_atts):
        image_embeds = self.backbone.get_vision_embeds(images)
        h = self.text_decoder.init_all(
            text_ids, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=jnp.ones(image_embeds.shape[:2],
                                            jnp.int32))
        return h

    def __call__(self, images, text_ids, text_atts, train=True,
                 deterministic=True):
        image_embeds = self.backbone.get_vision_embeds(
            images, deterministic=deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        hidden = self.text_decoder(text_ids, attention_mask=text_atts,
                                   encoder_hidden_states=image_embeds,
                                   encoder_attention_mask=image_atts,
                                   deterministic=deterministic)
        logits = self.text_decoder.mlm_logits(hidden, None)
        if not train:
            return logits
        labels = jnp.where(text_ids == self.pad_token_id, -100, text_ids)
        if self.prompt_length:
            # prompt-prefix loss masking (reference
            # models/model_generation.py:299-318)
            pos = jnp.arange(labels.shape[1])[None]
            labels = jnp.where(pos < self.prompt_length, -100, labels)
        per = shift_lm_loss(logits, labels,
                            label_smoothing=self.label_smoothing)
        return jnp.mean(per)

    def decode_step(self, token, image_embeds, image_atts, past_length=0,
                    deterministic=True, cross_from_cache=False,
                    encoder_group_size=None):
        """One KV-cached decode step; called under mutable=['cache'].
        `past_length` keeps RoBERTa pad-offset positions correct across
        steps; with `cross_from_cache` the image k/v projections are read
        from the cache written by the first step. `encoder_group_size=K`
        is the beam-search shape: image_embeds holds the UNIQUE images and
        each image's K beams are contiguous token rows — cross k/v are
        projected (and cached) once per image, and cross-attention views
        the beam queries per image (beam-3 384px: 131.9 → 279.3 img/s
        — beam now runs at the greedy rate; PERF.md round-5)."""
        hidden = self.text_decoder(token, attention_mask=None,
                                   encoder_hidden_states=image_embeds,
                                   encoder_attention_mask=image_atts,
                                   deterministic=deterministic, decode=True,
                                   past_length=past_length,
                                   cross_from_cache=cross_from_cache,
                                   encoder_group_size=encoder_group_size)
        return self.text_decoder.mlm_logits(hidden, None)[:, -1, :]

    def encode_images(self, images, deterministic=True):
        return self.backbone.get_vision_embeds(images,
                                               deterministic=deterministic)


def top_k_top_p_filtering(logits, top_k: int = 0, top_p: float = 1.0):
    """Mask logits outside the top-k / nucleus-p set to -inf
    (reference models/xbert.py:1487-1515), jit-friendly (static shapes:
    sort + threshold instead of scatter)."""
    neg = jnp.finfo(jnp.float32).min
    logits = logits.astype(jnp.float32)
    if top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        sorted_desc = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep while the mass *before* a token is < top_p (ensures the
        # first token always survives — the reference's shift-right)
        keep = (cum - probs) < top_p
        thresh = jnp.min(jnp.where(keep, sorted_desc, jnp.inf), axis=-1,
                         keepdims=True)
        logits = jnp.where(logits < thresh, neg, logits)
    return logits


def generate(model: XFMForCaptioning, variables, images, *, bos_id: int,
             eos_id: int, pad_id: int, max_len: int = 20,
             min_len: int = 0, greedy: bool = True, temperature: float = 1.0,
             top_k: int = 0, top_p: float = 1.0,
             rng: Optional[jax.Array] = None, num_return_sequences: int = 1,
             prompt_ids: tuple = ()):
    """Greedy/sampled decoding with the KV cache threaded through a
    lax.scan (reference OSCAR-style loop, models/xbert.py:1393-1484),
    compiled ONCE per (model, shapes, decode-config): an eager lax.scan
    would re-trace on every call (measured 17 s/batch vs sub-second jitted).

    `prompt_ids` (training-time prompt tokens, no specials) are forced into
    the first len(prompt_ids) output slots — the decoder conditions on the
    same prefix it was fine-tuned with (reference
    models/model_generation.py:323-347); callers strip those slots.

    Returns (sequences [B*n, max_len], per-token logprobs [B*n, max_len])
    — logprobs feed SCST (reference Captioning_scst.py:41-96).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _generate_jit(model, variables["params"], images, rng,
                         bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
                         max_len=max_len, min_len=min_len, greedy=greedy,
                         temperature=temperature, top_k=top_k, top_p=top_p,
                         num_return_sequences=num_return_sequences,
                         prompt_ids=tuple(prompt_ids))


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("model", "bos_id", "eos_id", "pad_id",
                                    "max_len", "min_len", "greedy",
                                    "temperature", "top_k", "top_p",
                                    "num_return_sequences", "prompt_ids"))
def _generate_jit(model, params, images, rng, *, bos_id, eos_id, pad_id,
                  max_len, min_len=0, greedy=True, temperature=1.0,
                  top_k=0, top_p=1.0, num_return_sequences=1,
                  prompt_ids=()):
    variables = {"params": params}
    image_embeds = model.apply({"params": params}, images,
                               method=XFMForCaptioning.encode_images)
    # n samples per image share the image: keep embeds unrepeated and view
    # the sample rows per image in cross-attention (encoder_group_size) —
    # the SCST 5-sample pass projects/caches cross k/v once per image
    gs = num_return_sequences if num_return_sequences > 1 else None
    B = image_embeds.shape[0] * num_return_sequences
    image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)

    if rng is None:
        rng = jax.random.PRNGKey(0)

    # prompt forcing (reference models/model_generation.py:323-347: the
    # decoder is seeded with the training-time prompt tokens; callers strip
    # the first len(prompt_ids) slots before scoring)
    P = len(prompt_ids)
    prompt_arr = jnp.asarray(prompt_ids, jnp.int32) if P else None

    def select(logits, done, rng, pos):
        logits = logits.astype(jnp.float32) / temperature
        if min_len > 0:
            # EOS suppressed until `min_len` tokens are generated
            # (reference HF generate min_length, models/xbert.py:1368-1391
            # path; configs/xfm-ft/Captioning.yaml:33)
            blocked = logits.at[..., eos_id].set(-1e9)
            logits = jnp.where(pos < min_len, blocked, logits)
        if not greedy and (top_k > 0 or top_p < 1.0):
            logits = top_k_top_p_filtering(logits, top_k, top_p)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if greedy:
            nxt = jnp.argmax(logp, axis=-1)
        else:
            nxt = jax.random.categorical(rng, logp, axis=-1)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        if P:
            # sequence slot pos-1 (0-based, after BOS) is prompt-forced
            forced = pos <= P
            nxt = jnp.where(forced,
                            prompt_arr[jnp.clip(pos - 1, 0, P - 1)], nxt)
            tok_logp = jnp.where(forced, 0.0, tok_logp)
        nxt = jnp.where(done, pad_id, nxt)
        tok_logp = jnp.where(done, 0.0, tok_logp)
        done = done | (nxt == eos_id)
        return nxt, tok_logp, done

    # First step (BOS) also creates the cache collection.
    bos = jnp.full((B, 1), bos_id, jnp.int32)
    logits, cache_vars = model.apply(
        {"params": params}, bos, image_embeds, image_atts, 0,
        encoder_group_size=gs,
        method=XFMForCaptioning.decode_step, mutable=["cache"])
    rng, sub = jax.random.split(rng)
    tok0, logp0, done0 = select(logits, jnp.zeros((B,), bool), sub, 1)

    def step(carry, i):
        cache, tok, done, rng = carry
        logits, new_vars = model.apply(
            {"params": params, "cache": cache}, tok[:, None], image_embeds,
            image_atts, i + 1, True, True, encoder_group_size=gs,
            method=XFMForCaptioning.decode_step, mutable=["cache"])
        rng, sub = jax.random.split(rng)
        nxt, tok_logp, done = select(logits, done, sub, i + 2)
        return (new_vars["cache"], nxt, done, rng), (nxt, tok_logp)

    init = (cache_vars["cache"], tok0, done0, rng)
    _, (toks, logps) = jax.lax.scan(step, init, jnp.arange(max_len - 1))
    seqs = jnp.concatenate([tok0[:, None], jnp.transpose(toks)], axis=1)
    lps = jnp.concatenate([logp0[:, None], jnp.transpose(logps)], axis=1)
    return seqs, lps


def beam_generate(model: XFMForCaptioning, variables, images, *, bos_id: int,
                  eos_id: int, pad_id: int, max_len: int = 20,
                  min_len: int = 0, num_beams: int = 3,
                  length_penalty: float = 1.0, prompt_ids: tuple = ()):
    """Beam search with the KV cache reordered per step
    (reference HF beam path, models/xbert.py:1368-1391 `_reorder_cache`).

    Whole search compiles once per (model, shapes, beam-config); cache
    leaves are gathered along the beam dimension each step. `prompt_ids`
    are forced into the first slots of every beam (beams diverge at the
    first free step, exactly like HF's prompt-seeded search — reference
    models/model_generation.py:323-347). Returns best sequences
    [B, max_len]."""
    return _beam_generate_jit(model, variables["params"], images,
                              bos_id=bos_id, eos_id=eos_id, pad_id=pad_id,
                              max_len=max_len, min_len=min_len,
                              num_beams=num_beams,
                              length_penalty=length_penalty,
                              prompt_ids=tuple(prompt_ids))


@_partial(jax.jit, static_argnames=("model", "bos_id", "eos_id", "pad_id",
                                    "max_len", "min_len", "num_beams",
                                    "length_penalty", "prompt_ids"))
def _beam_generate_jit(model, params, images, *, bos_id, eos_id, pad_id,
                       max_len, min_len=0, num_beams=3, length_penalty=1.0,
                       prompt_ids=()):
    image_embeds = model.apply({"params": params}, images,
                               method=XFMForCaptioning.encode_images)
    B = image_embeds.shape[0]
    K = num_beams
    # image_embeds stay UNREPEATED: each image's K beams are contiguous
    # query rows, cross-attention views them per image against
    # once-projected (and once-cached) cross k/v (encoder_group_size) —
    # K× less cross-kv projection/cache and K× less cross-attention kv
    # traffic than repeating the image per beam.
    image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)

    bos = jnp.full((B * K, 1), bos_id, jnp.int32)
    logits, cache_vars = model.apply(
        {"params": params}, bos, image_embeds, image_atts, 0,
        encoder_group_size=K,
        method=XFMForCaptioning.decode_step, mutable=["cache"])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    logp = logp.reshape(B, K, -1)[:, 0, :]                # beams identical
    if min_len > 1:  # cur_len incl. bos is 1 here (HF min_length semantics)
        logp = logp.at[:, eos_id].set(-1e9)
    V = logp.shape[-1]
    P = len(prompt_ids)
    prompt_arr = jnp.asarray(prompt_ids, jnp.int32) if P else None
    scores0, tok0 = jax.lax.top_k(logp, K)                # [B, K]
    if P:
        # prompt-forced slots: all beams share the prefix; only beam 0
        # carries a live score so the first FREE step's top-k expands K
        # distinct candidates from it (no duplicate-beam collapse)
        tok0 = jnp.full((B, K), prompt_ids[0], jnp.int32)
        scores0 = jnp.broadcast_to(
            jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32), (B, K))

    def gather_beams(tree, beam_idx):
        def one(path, x):
            # skip non-batched leaves (e.g. the scalar cache index)
            if jnp.ndim(x) == 0 or x.shape[0] != B * K:
                return x
            # cross k/v caches are BEAM-INVARIANT: they are projected once
            # from the K-repeated image embeds, so every beam of an image
            # holds identical rows and the reorder is a semantic no-op.
            # Skipping them removed the dominant beam cost at the time —
            # ~2 GB/step of [B·K, 577, H, D] gathers (30.3 -> 131.9 img/s);
            # with encoder_group_size the cross cache is per-image [B, ...]
            # and this check also covers it structurally (PERF.md r5).
            if any("cross_" in str(getattr(k, "key", k)) for k in path):
                return x
            xb = x.reshape(B, K, *x.shape[1:])
            idx = beam_idx.reshape(B, K, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xb, idx, axis=1).reshape(x.shape)

        return jax.tree_util.tree_map_with_path(one, tree)

    def step(carry, i):
        cache, scores, tok, done, seqs = carry
        logits, new_vars = model.apply(
            {"params": params, "cache": cache}, tok.reshape(B * K, 1),
            image_embeds, image_atts, i + 1, True, True,
            encoder_group_size=K,
            method=XFMForCaptioning.decode_step, mutable=["cache"])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        logp = logp.reshape(B, K, V)
        if min_len > 0:
            # cur_len incl. bos at this step is i + 2
            blocked = logp.at[..., eos_id].set(-1e9)
            logp = jnp.where(i + 2 < min_len, blocked, logp)
        # finished beams: only pad continues, with 0 logp
        pad_only = jnp.full((V,), -1e9).at[pad_id].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None], logp)
        cand = scores[..., None] + logp                    # [B, K, V]
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)
        beam_idx = idx // V
        new_tok = (idx % V).astype(jnp.int32)
        if P:
            # slot i+1 still inside the prompt: force the token on every
            # beam, keep scores and beam order (identity reorder)
            forced = (i + 1) < P
            ftok = prompt_arr[jnp.clip(i + 1, 0, P - 1)]
            new_tok = jnp.where(forced, ftok, new_tok)
            new_scores = jnp.where(forced, scores, new_scores)
            beam_idx = jnp.where(forced,
                                 jnp.broadcast_to(jnp.arange(K), (B, K)),
                                 beam_idx)
        cache = gather_beams(new_vars["cache"], beam_idx)
        seqs = gather_beams(seqs.reshape(B * K, -1),
                            beam_idx).reshape(B, K, -1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        done = done | (new_tok == eos_id)
        seqs = jax.lax.dynamic_update_slice(
            seqs, new_tok[..., None], (0, 0, i + 1))
        return (cache, new_scores, new_tok, done, seqs), None

    seqs0 = jnp.full((B, K, max_len), pad_id, jnp.int32)
    seqs0 = seqs0.at[:, :, 0].set(tok0)
    done0 = tok0 == eos_id
    carry = (cache_vars["cache"], scores0, tok0, done0, seqs0)
    (cache, scores, tok, done, seqs), _ = jax.lax.scan(
        step, carry, jnp.arange(max_len - 1))

    # length-penalized best beam
    lengths = jnp.sum((seqs != pad_id).astype(jnp.float32), axis=-1)
    adj = scores / jnp.maximum(lengths, 1.0) ** length_penalty
    best = jnp.argmax(adj, axis=1)
    return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]
