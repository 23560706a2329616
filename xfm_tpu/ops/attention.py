"""Attention ops: the single entry point every model in the framework uses.

Replaces the reference's eager torch attention
(reference models/beit2.py:127-166, models/xbert.py:296-341) with:

- an XLA einsum path (`_xla_attention`) — always available, used on CPU and
  as the autodiff rule;
- a Pallas flash-attention path (`xfm_tpu.ops.flash_attention`) fusing the
  softmax(QK^T + rel_pos_bias + mask)V pipeline in VMEM — used on TPU when
  shapes allow.

All inputs use [batch, seq, heads, head_dim] layout. `bias` is an additive
attention bias broadcastable to [batch, heads, q_len, k_len]; this carries
both BEiT-2 relative-position bias (reference models/beit2.py:139-148) and
the −inf padding masks the BERT fork folds in via `extended_attention_mask`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative used for masking (bf16-safe; reference uses -10000/-inf)


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Nk] or [B, 1, Nq, Nk] {0,1} mask → additive bias.

    Mirrors `get_extended_attention_mask` ((1-m)*-10000) of the HF fork used
    at reference models/xbert.py:979-1004.
    """
    if mask.ndim == 2:
        mask = mask[:, None, None, :]
    elif mask.ndim == 3:
        mask = mask[:, None, :, :]
    return (1.0 - mask.astype(dtype)) * NEG_INF


def remat_policy(name: str):
    """Named activation-checkpointing policies used by the encoders.

    'full'        — recompute everything (reference-style gradient
                    checkpointing, models/xbert.py:584-606);
    'dots'        — XLA dots_with_no_batch_dims_saveable;
    'except_attn' — save every intermediate EXCEPT the O(N^2) attention
                    logits/probs tensors (named in `_xla_attention`); the
                    backward recomputes just QK^T+softmax. Flash-attention
                    memory behavior with XLA's saved-everything-else speed —
                    measured the best batch-scaling policy on v5e.
    'attn_out'    — save ONLY each layer's attention output ([B, N, C] per
                    block, named in the attention modules): the backward
                    recomputes the cheap LN/MLP/bias chain but never re-runs
                    an attention forward kernel. Sits between 'full'
                    (recompute all) and 'except_attn' (save most) — the
                    selective policy for batch sizes past 48 at 327M.
    """
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "except_attn":
        return jax.checkpoint_policies.save_anything_except_these_names(
            "attn_logits", "attn_probs")
    if name == "attn_out":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    return None


def name_attn_out(x):
    """Tag an attention-module output for the 'attn_out' remat policy
    (identity outside a policied jax.checkpoint region)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "attn_out")


def _xla_attention(q, k, v, bias, scale):
    # q,k,v: [B, N, H, D]; softmax in fp32, output in q.dtype. Matmuls stay
    # MXU-eligible (bf16 in, fp32 accumulate). q is scaled before the matmul
    # (reference models/beit2.py:137 and the fp16 guard models/xbert.py:296-330).
    # logits/probs are checkpoint-named so the 'except_attn' remat policy can
    # drop the O(N^2) score tensors from the saved residuals and recompute
    # them in the backward pass (flash-attention memory at XLA speed).
    from jax.ad_checkpoint import checkpoint_name

    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    logits = checkpoint_name(logits, "attn_logits")
    probs = checkpoint_name(jax.nn.softmax(logits, axis=-1), "attn_probs")
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_flash: Optional[bool] = None,
    prob_gate: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over [B, N, H, D] tensors.

    `prob_gate` ([B|1, H|1, Nq, Nk], usually ones) multiplies the post-softmax
    probabilities; its gradient is attn ⊙ ∂score/∂attn — the GradCAM signal
    of the reference's save_attention hooks (reference models/xbert.py:247-259,
    Grounding.py:76-126)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if mask is not None:
        mbias = mask_to_bias(mask)
        bias = mbias if bias is None else bias + mbias

    if prob_gate is not None:
        qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1) * prob_gate
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)

    impl = os.environ.get("XFM_ATTN_IMPL", "auto")
    if impl == "jaxflash" and _on_tpu() and (
            deterministic or dropout_rate == 0.0):
        return _jax_flash(q, k, v, bias, scale)
    if use_flash is None:
        use_flash = _flash_ok(q, k, dropout_rate, deterministic)
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, bias, scale)

    if (deterministic or dropout_rate == 0.0) and _attn_remat():
        # Checkpoint JUST the attention math: the backward recomputes the
        # O(N^2) logits/probs from q/k/v instead of saving them — flash-
        # attention memory behavior at XLA-fusion speed, ~5% FLOP overhead.
        # This is what unlocks batch sizes past ~48 for the 327M pretrain
        # step on a 16 GB chip (measured on v5e, PERF.md).
        if bias is None:
            return jax.checkpoint(
                lambda q_, k_, v_: _xla_attention(q_, k_, v_, None, scale)
            )(q, k, v)
        return jax.checkpoint(
            lambda q_, k_, v_, b_: _xla_attention(q_, k_, v_, b_, scale)
        )(q, k, v, bias)

    out = _dropout_attention(q, k, v, bias, scale, dropout_rate, dropout_rng,
                             deterministic)
    return out


def _dropout_attention(q, k, v, bias, scale, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return _xla_attention(q, k, v, bias, scale)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _attn_remat() -> bool:
    """Recompute attention scores in the backward pass instead of saving
    them (XFM_ATTN_REMAT=0 restores save-probs autodiff)."""
    return os.environ.get("XFM_ATTN_REMAT", "0") == "1"


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


import os


def _jax_flash(q, k, v, bias, scale):
    """jax.experimental.pallas TPU flash-attention backend (A/B option):
    [B,N,H,D] → [B,H,N,D], seqs padded to 128 multiples, bias materialized
    to [B,H,Nq,Nk]."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jfa)

    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    pq = (-Nq) % 128
    pk = (-Nk) % 128

    def to_bhnd(x, pad):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qt, kt, vt = to_bhnd(q, pq), to_bhnd(k, pk), to_bhnd(v, pk)
    ab = None
    if bias is not None or pk:
        if bias is None:
            bias = jnp.zeros((1, 1, 1, Nk), jnp.float32)
        ab = jnp.broadcast_to(bias.astype(jnp.float32), (B, H, Nq, Nk))
        ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pq), (0, pk)),
                     constant_values=NEG_INF)
    out = jfa(qt, kt, vt, ab=ab, sm_scale=scale)
    return jnp.swapaxes(out[:, :, :Nq, :], 1, 2).astype(q.dtype)


def _flash_ok(q, k, dropout_rate, deterministic) -> bool:
    if os.environ.get("XFM_DISABLE_FLASH", "0") == "1":
        return False
    if not _on_tpu():
        return False
    if dropout_rate > 0.0 and not deterministic:
        return False
    # Measured on v5e (XFM-base pretrain step): XLA's fused attention beats
    # the Pallas kernel at N=197 (153.6 vs 127.6 samples/s/chip) — the
    # 64→128 head-dim lane padding doubles QK/PV work. Keep the kernel for
    # genuinely long sequences where score-matrix HBM traffic dominates.
    return q.shape[1] >= 512 and k.shape[1] >= 512
