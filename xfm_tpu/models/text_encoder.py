"""TextTransformer — the BERT/RoBERTa-style engine behind X-FM's text encoder,
fusion encoder and cross-modal decoders, rebuilt as one Flax module.

Replicates the behavioral surface of the reference forks
(reference models/xbert.py, models/xroberta.py):

- RoBERTa pad-offset position ids (reference models/xroberta.py:104-117,
  `create_position_ids_from_input_ids`) or BERT absolute positions;
- per-layer cross-attention from `fusion_layer` on, with k/v projected from
  `encoder_width` (the vision width; reference models/xbert.py:234-240,463-466);
- encoder `mode` slicing the layer range: 'text' = [0, fusion_layer),
  'fusion' = [fusion_layer, N), 'multi_modal' = [0, N)
  (reference models/xbert.py:562-574);
- `inputs_embeds` entry that *bypasses* the embedding layer (the fork's
  `encoder_embeds=` path, reference models/xbert.py:1006-1011,1052-1061);
- masked-position MLM head that gathers only `masked_pos` before the vocab
  projection (reference models/xbert.py:1544-1545,1595-1601) — in JAX this is
  a static-shape take_along_axis over `max_masks` positions;
- causal decoder mode with a KV cache for generation
  (reference models/xbert.py:1240-1387).

Attention q-scaling happens before the QK matmul, which also subsumes the
fork's fp16 overflow guard (reference models/xbert.py:296-330).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, mask_to_bias, NEG_INF
from ..ops.fused_ln import FusedLayerNorm

def gelu_exact(x):
    """erf-GELU (torch nn.GELU default — the reference's activation,
    needed for parity with erf-trained checkpoints).

    Served by ops.activations.gelu_erf: a tanh-form minimax approximation
    that is within 1 bf16 ulp of true erf-GELU for every finite bf16 input
    (exhaustively tested) but runs at tanh-GELU VPU cost — XLA's erf is
    compute-bound at ~2.75x the HBM-bandwidth floor (PERF.md).
    XFM_EXACT_ERF=1 restores XLA's erf. Configs still choose via
    `hidden_act`: 'gelu' (erf) for released-weight fine-tuning,
    'gelu_tanh' (flax default; PaLM/ViT-22B) for from-scratch recipes."""
    from ..ops.activations import gelu_erf

    return gelu_erf(x)

ACT = {
    "gelu": gelu_exact,
    "gelu_tanh": partial(jax.nn.gelu, approximate=True),
    "gelu_new": partial(jax.nn.gelu, approximate=True),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "relu": jax.nn.relu,
}


class ActDense(nn.Module):
    """`y = Dense(act(x))` — the MLP tail. Param tree identical to
    nn.Dense (kernel/bias), so checkpoints interchange. Under
    XFM_MLP_FUSED=1 on TPU the activation runs as a VMEM prologue inside
    Pallas matmuls (ops/fused_mlp.py) so the [*, intermediate] activated
    tensor never round-trips HBM; default is the identical-math XLA
    composition."""
    features: int
    act: str
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        from ..ops.fused_mlp import act_dense, fused_mlp_ok

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if fused_mlp_ok() and self.act in ("gelu", "gelu_tanh", "gelu_new",
                                           "relu"):
            act = "gelu_tanh" if self.act == "gelu_new" else self.act
            return act_dense(x.astype(self.dtype), kernel.astype(self.dtype),
                             bias.astype(self.dtype), act)
        h = ACT[self.act](x)
        return (h.astype(self.dtype) @ kernel.astype(self.dtype)
                + bias.astype(self.dtype))


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    # X-FM fork extensions:
    fusion_layer: int = 12          # first layer with cross-attention
    encoder_width: int = 768        # width of the cross-attended encoder states
    position_style: str = "roberta"  # 'roberta' pad-offset | 'bert' absolute
    is_decoder: bool = False
    decode_cache_len: int = 0       # KV-cache slots for incremental decode;
                                    # 0 = max_position_embeddings. Caption /
                                    # VQA decodes are ~10-25 tokens — sizing
                                    # the cache to the actual decode budget
                                    # saves HBM and scan-carry width.
    seq_shard: bool = False         # Megatron-SP style sequence parallelism:
                                    # between blocks, hidden states are
                                    # constrained to shard the token dim over
                                    # the tensor axis, so LN / dropout /
                                    # residual work (and its activation
                                    # memory) splits across tp ranks instead
                                    # of replicating. No-op without a tensor
                                    # mesh axis. Beyond-reference capability
                                    # (reference is DP-only, SURVEY §2.2).
    remat: bool = False             # activation checkpointing per layer
                                    # (reference models/xbert.py:584-606)
    remat_policy: str = "full"      # 'full' = recompute everything;
                                    # 'dots' = keep weight-stationary matmul
                                    # outputs, recompute attention probs +
                                    # elementwise (cheap FLOPs, kills the
                                    # O(N²) softmax activation memory)
    dtype: Any = jnp.float32        # compute dtype

    @classmethod
    def roberta_base(cls, **kw):
        return cls(**{**dict(vocab_size=50265, max_position_embeddings=514,
                             pad_token_id=1, layer_norm_eps=1e-5,
                             position_style="roberta", type_vocab_size=1), **kw})

    @classmethod
    def bert_base(cls, **kw):
        return cls(**{**dict(vocab_size=30522, max_position_embeddings=512,
                             pad_token_id=0, layer_norm_eps=1e-12,
                             position_style="bert", type_vocab_size=2), **kw})


def roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int,
                         past_length: int = 0) -> jnp.ndarray:
    """Pad-offset position ids (reference models/xroberta.py:38-49):
    positions count non-pad tokens, offset by padding_idx; pads stay at
    padding_idx."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = (jnp.cumsum(mask, axis=1) + past_length) * mask
    return incremental + pad_token_id


class Embeddings(nn.Module):
    config: TextConfig

    def setup(self):
        c = self.config
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=c.dtype)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size, dtype=c.dtype)
        self.token_type_embeddings = nn.Embed(c.type_vocab_size,
                                              c.hidden_size, dtype=c.dtype)
        self.LayerNorm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype)
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 past_length=0, deterministic=True):
        c = self.config
        if position_ids is None:
            if c.position_style == "roberta":
                position_ids = roberta_position_ids(input_ids, c.pad_token_id,
                                                    past_length)
            else:
                position_ids = (jnp.arange(input_ids.shape[1])[None, :]
                                + past_length)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.LayerNorm(x)
        x = self.dropout(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    """Self- or cross-attention with BERT post-LN output
    (reference models/xbert.py:222-366). For cross-attention k/v project from
    `encoder_width` features (reference models/xbert.py:234-240)."""
    config: TextConfig
    is_cross: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, hidden, kv_source, attention_bias, deterministic=True,
                 decode=False, prob_gate=None, cross_from_cache=False,
                 kv_row_idx=None, kv_group_size=None):
        """`kv_row_idx` ([B] int): cross-attention k/v are projected from the
        *unique* kv_source rows (e.g. B images) and gathered per hidden row —
        the ITM hard-negative pass re-reads each image up to 3x, and
        projecting once saves ~2/3 of the cross k/v matmul FLOPs (the
        reference re-projects from gathered rows, models/xfm.py:788-795).

        `kv_group_size` (static int): grouped-batch cross-attention —
        kv_source holds U unique rows, hidden holds B = U·gs rows where
        rows [u·gs, (u+1)·gs) all attend to kv row u. q is VIEWED as
        [U, gs·Nq, H, D] (contiguous reshape, free) and attends against
        the per-unique k/v: no repeat materialization, no per-layer
        gather — the retrieval-rerank formulation (the k_test candidates
        of one image are contiguous). attention_bias rows within a group
        must be identical (they describe the shared kv row); the group's
        first row is used."""
        c = self.config
        H = c.num_attention_heads
        D = c.hidden_size // H

        q = nn.Dense(c.hidden_size, name="query", dtype=c.dtype)(hidden)
        B, Nq = hidden.shape[:2]
        q = q.reshape(B, Nq, H, D)

        if decode and self.is_cross and cross_from_cache:
            # Cross k/v depend only on the encoder states: the first decode
            # step projected and cached them; later steps (a separate trace —
            # the flag is static) read the cache and skip the projections
            # (the reference's HF past_key_values carry the same trick,
            # reference models/xbert.py:270-278).
            Nk = kv_source.shape[1]
            ck = self.variable("cache", "cross_k", jnp.zeros,
                               (B, Nk, H, D), c.dtype)
            cv = self.variable("cache", "cross_v", jnp.zeros,
                               (B, Nk, H, D), c.dtype)
            k, v = ck.value, cv.value
        else:
            k = nn.Dense(c.hidden_size, name="key", dtype=c.dtype)(kv_source)
            v = nn.Dense(c.hidden_size, name="value",
                         dtype=c.dtype)(kv_source)
            U = kv_source.shape[0]
            k = k.reshape(U, kv_source.shape[1], H, D)
            v = v.reshape(U, kv_source.shape[1], H, D)
            if kv_row_idx is not None:
                # For LARGE gathers, tie this layer's k/v gather to its own
                # query activations: XLA's scheduler otherwise hoists ALL
                # layers' (cheap) gathers to the program start, keeping
                # every layer's gathered k/v live at once (measured 36 GB —
                # 10 layers' worth — on the k_test=256 rerank at 384px).
                # Small gathers skip the barrier: the liveness is harmless
                # and the scheduling freedom is worth ~3% (vqa_rank 71.6 vs
                # 69.2 q/s).
                if kv_row_idx.shape[0] * kv_source.shape[1] > 500_000:
                    k, v, _ = jax.lax.optimization_barrier((k, v, hidden))
                k = jnp.take(k, kv_row_idx, axis=0)
                v = jnp.take(v, kv_row_idx, axis=0)
            if decode and self.is_cross:
                ck = self.variable("cache", "cross_k", jnp.zeros, k.shape,
                                   c.dtype)
                cv = self.variable("cache", "cross_v", jnp.zeros, v.shape,
                                   c.dtype)
                ck.value = k.astype(c.dtype)
                cv.value = v.astype(c.dtype)

        if decode and not self.is_cross:
            # KV-cache for incremental decoding (causal generation), sized
            # to the decode budget (decode_cache_len) instead of the full
            # 514-slot position table.
            L = c.decode_cache_len or c.max_position_embeddings
            ck = self.variable("cache", "k", jnp.zeros,
                               (B, L, H, D), k.dtype)
            cv = self.variable("cache", "v", jnp.zeros,
                               (B, L, H, D), v.dtype)
            idx = self.variable("cache", "index",
                                lambda: jnp.zeros((), jnp.int32))
            i = idx.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, i, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, i, 0, 0))
            idx.value = i + Nq
            k, v = ck.value, cv.value
            # Mask cache positions beyond each query's own slot — causal
            # WITHIN a multi-token chunk too (query row j sits at cache
            # position i+j and may see positions <= i+j only; a flat
            # `pos < i+Nq` bound would let chunk tokens attend forward)
            pos = jnp.arange(k.shape[1])[None, None, None, :]
            qpos = i + jnp.arange(Nq)[None, None, :, None]
            valid = pos <= qpos
            cbias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
            attention_bias = cbias if attention_bias is None \
                else attention_bias + cbias
        elif self.causal and not self.is_cross:
            Nk = k.shape[1]
            causal = jnp.tril(jnp.ones((Nq, Nk), bool))[None, None]
            cbias = jnp.where(causal, 0.0, NEG_INF).astype(jnp.float32)
            attention_bias = cbias if attention_bias is None \
                else attention_bias + cbias

        drop_rng = None
        if not deterministic and c.attention_probs_dropout_prob > 0:
            drop_rng = self.make_rng("dropout")
        if kv_group_size and self.is_cross:
            # also valid in decode: cross k/v are static per step and the
            # cache holds the per-unique rows (beam search caches one image
            # per beam GROUP, not per beam)
            if prob_gate is not None:
                raise NotImplementedError(
                    "kv_group_size with prob_gate (GradCAM) unsupported")
            gs = int(kv_group_size)
            U = k.shape[0]
            qg = q.reshape(U, gs * Nq, H, D)
            bias_g = attention_bias
            if bias_g is not None and bias_g.shape[0] == B:
                bias_g = bias_g[::gs]
            ctx = dot_product_attention(
                qg, k, v, bias=bias_g,
                dropout_rate=c.attention_probs_dropout_prob,
                dropout_rng=drop_rng, deterministic=deterministic)
        else:
            ctx = dot_product_attention(
                q, k, v, bias=attention_bias,
                dropout_rate=c.attention_probs_dropout_prob,
                dropout_rng=drop_rng, deterministic=deterministic,
                prob_gate=prob_gate)
        ctx = ctx.reshape(B, Nq, c.hidden_size)
        from ..ops.attention import name_attn_out

        ctx = name_attn_out(ctx)  # saved by the 'attn_out' remat policy

        out = nn.Dense(c.hidden_size, name="attn_out", dtype=c.dtype)(ctx)
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)
        # post-LN residual in one fused pass (ops/fused_ln.py; param-
        # compatible with nn.LayerNorm)
        out = FusedLayerNorm(epsilon=c.layer_norm_eps,
                             name="output_LayerNorm",
                             dtype=c.dtype)(out, residual=hidden)
        return out


class TransformerLayer(nn.Module):
    config: TextConfig
    has_cross_attention: bool = False

    @nn.compact
    def __call__(self, hidden, attention_bias=None, encoder_hidden_states=None,
                 encoder_attention_bias=None, deterministic=True, decode=False,
                 cross_prob_gate=None, cross_from_cache=False,
                 encoder_row_idx=None, encoder_group_size=None):
        c = self.config
        x = SelfAttention(c, causal=c.is_decoder, name="attention")(
            hidden, hidden, attention_bias, deterministic, decode)
        if self.has_cross_attention and encoder_hidden_states is not None:
            x = SelfAttention(c, is_cross=True, name="crossattention")(
                x, encoder_hidden_states, encoder_attention_bias,
                deterministic, decode, prob_gate=cross_prob_gate,
                cross_from_cache=cross_from_cache,
                kv_row_idx=encoder_row_idx,
                kv_group_size=encoder_group_size)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense",
                     dtype=c.dtype)(x)
        h = ActDense(c.hidden_size, act=c.hidden_act, name="output_dense",
                     dtype=c.dtype)(h)
        h = nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)
        x = FusedLayerNorm(epsilon=c.layer_norm_eps, name="ffn_LayerNorm",
                           dtype=c.dtype)(h, residual=x)
        return x


class TextTransformer(nn.Module):
    """Encoder stack with mode-sliced layer ranges (see module docstring).

    With `with_mlm=True` this is the RobertaForMaskedLM/BertForMaskedLM
    equivalent: `mlm_logits` applies the vocab head (tied to the word
    embedding, HF default) after an optional masked-position gather."""
    config: TextConfig
    with_mlm: bool = False

    def setup(self):
        c = self.config
        self.embeddings = Embeddings(c)
        layer_cls = TransformerLayer
        if c.remat:
            # recompute each layer in the backward pass: activation memory
            # drops from O(L) to O(1) layers (trades ~1/3 more FLOPs);
            # 'dots'/'except_attn' are selective (see ops.attention.remat_policy)
            from ..ops.attention import remat_policy

            # static: deterministic (5), decode (6), cross_from_cache (8)
            # — cross_from_cache is a python bool branched on inside
            # SelfAttention; threaded as a dynamic kwarg it would trace and
            # raise TracerBoolConversionError on the KV-cached decode path
            layer_cls = nn.remat(TransformerLayer, static_argnums=(5, 6, 8),
                                 policy=remat_policy(c.remat_policy))
        self.layers = [
            layer_cls(c, has_cross_attention=(i >= c.fusion_layer),
                      name=f"layer_{i}")
            for i in range(c.num_hidden_layers)
        ]
        if self.with_mlm:
            self.mlm_head = MLMHead(c)

    def mlm_logits(self, hidden, masked_pos=None):
        if masked_pos is not None:
            hidden = gather_positions(hidden, masked_pos)
        table = self.embeddings.word_embeddings.embedding
        return self.mlm_head(hidden, shared_embedding=table)

    def init_all(self, input_ids, attention_mask=None,
                 encoder_hidden_states=None, encoder_attention_mask=None):
        """Exercise every submodule so `init` creates the full param tree
        (flax creates params lazily on first use)."""
        h = self(input_ids, attention_mask=attention_mask,
                 encoder_hidden_states=encoder_hidden_states,
                 encoder_attention_mask=encoder_attention_mask,
                 mode="multi_modal")
        if self.with_mlm:
            _ = self.mlm_logits(h, None)
        return h

    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 mode="multi_modal", deterministic=True, decode=False,
                 past_length=0, cross_gate=None, cross_gate_layer=None,
                 cross_from_cache=False, encoder_row_idx=None,
                 encoder_group_size=None):
        c = self.config
        if inputs_embeds is not None:
            # encoder_embeds path: bypass embeddings entirely
            # (reference models/xbert.py:1052-1061).
            x = inputs_embeds
        else:
            x = self.embeddings(input_ids, token_type_ids, position_ids,
                                past_length, deterministic)

        bias = None
        if attention_mask is not None:
            bias = mask_to_bias(attention_mask)
        # A list/tuple of encoder states is cycled across cross-attention
        # layers (reference models/xbert.py:497-507): layer i attends to
        # states[(i - fusion_layer) % len(states)].
        enc_list = ebias_list = None
        ebias = None
        if isinstance(encoder_hidden_states, (list, tuple)):
            enc_list = list(encoder_hidden_states)
            if encoder_attention_mask is None:
                encoder_attention_mask = [
                    jnp.ones(e.shape[:2], jnp.int32) for e in enc_list]
            ebias_list = [mask_to_bias(m) for m in encoder_attention_mask]
        elif encoder_hidden_states is not None:
            if encoder_attention_mask is None:
                # per-ROW mask: with encoder_row_idx the states hold the
                # unique rows, the hidden batch sets the row count
                nrows = (encoder_row_idx.shape[0]
                         if encoder_row_idx is not None
                         else encoder_hidden_states.shape[0])
                encoder_attention_mask = jnp.ones(
                    (nrows, encoder_hidden_states.shape[1]), jnp.int32)
            ebias = mask_to_bias(encoder_attention_mask)

        if mode == "text":
            lo, hi = 0, c.fusion_layer
        elif mode == "fusion":
            lo, hi = c.fusion_layer, c.num_hidden_layers
        else:
            lo, hi = 0, c.num_hidden_layers

        extra = {}
        if encoder_row_idx is not None:
            extra["encoder_row_idx"] = encoder_row_idx
        if encoder_group_size is not None:
            extra["encoder_group_size"] = encoder_group_size
        if c.seq_shard:
            from ..core.mesh import constrain_seq_sharding

            x = constrain_seq_sharding(x)
        for i, layer in enumerate(self.layers[lo:hi], start=lo):
            enc, eb = encoder_hidden_states, ebias
            if enc_list is not None:
                j = (i - c.fusion_layer) % len(enc_list)
                enc, eb = enc_list[j], ebias_list[j]
            gate = cross_gate if (cross_gate is not None
                                  and i == cross_gate_layer) else None
            # cross_from_cache rides positionally so the remat wrapper can
            # treat it as static (static_argnums only covers positionals)
            x = layer(x, bias, enc, eb, deterministic, decode, gate,
                      bool(cross_from_cache), **extra)
            if c.seq_shard:
                x = constrain_seq_sharding(x)
        return x


class MLMHead(nn.Module):
    """RoBERTa lm_head / BERT cls.predictions: dense → act → LN → vocab decoder
    (reference models/xroberta.py:1313-1340). Weight tying to the word
    embedding is handled by the caller passing `shared_embedding`."""
    config: TextConfig

    @nn.compact
    def __call__(self, hidden, shared_embedding=None):
        c = self.config
        x = nn.Dense(c.hidden_size, name="dense", dtype=c.dtype)(hidden)
        x = gelu_exact(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm",
                         dtype=c.dtype)(x)
        if shared_embedding is not None:
            logits = x.astype(jnp.float32) @ shared_embedding.T.astype(jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c.vocab_size,))
            logits = logits + bias
        else:
            logits = nn.Dense(c.vocab_size, name="decoder",
                              dtype=jnp.float32)(x.astype(jnp.float32))
        return logits


def gather_positions(hidden: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Static-shape gather of masked positions before the MLM head
    (reference models/xbert.py:1544-1545 `gather_seq_out_by_pos`)."""
    return jnp.take_along_axis(hidden, positions[..., None], axis=1)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = -100,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean CE over non-ignored labels; torch F.cross_entropy semantics."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def per_sample_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = -100,
                       label_smoothing: float = 0.0) -> jnp.ndarray:
    """Per-sample summed causal LM loss (reference models/xroberta.py:1107-1114
    always uses reduction='none' then .sum(1)). logits/labels already shifted."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.sum(jnp.where(valid, nll, 0.0), axis=-1)
