"""Pallas fused attention for TPU.

Replaces the unfused softmax(QK^T + bias)V chain of the reference
(reference models/beit2.py:136-160, models/xbert.py:296-341) with a single
VMEM-resident kernel.

Design notes (TPU-first):
- X-FM sequence lengths are small (≤30-128 text tokens, ≤901 image patches +
  cls; reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml:88-89 and
  configs/xfm-ft/VQA.yaml:18). At these sizes the whole K/V for one (batch,
  head) fits comfortably in VMEM, so we use a *one-pass* fused kernel blocked
  over queries — strictly less work than online-softmax flash attention, same
  memory behavior (the [q, k] score tile never leaves VMEM).
- `bias` is an additive term with broadcastable shape [1|B, 1|H, 1|Nq, Nk]:
  the BEiT-2 relative-position bias arrives as [1, H, N, N], padding masks as
  [B, 1, 1, Nk]. Broadcasting is handled in the BlockSpec index maps so the
  full [B, H, Nq, Nk] bias is never materialized in HBM.
- Head dim (64 for XFM-base) is zero-padded to the 128-lane width; zero
  padding is exact for QK^T and for the output columns we slice away.
- Backward: custom_vjp recomputes attention with the XLA path and
  differentiates through it (rematerialization — trades FLOPs for HBM, the
  right trade on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running on CPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nk_valid, blk_q):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [blk_q, Dp]
    k = k_ref[0, 0]                                       # [Nkp, Dp]
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [blk_q, Nkp]
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)
    v = v_ref[0, 0]                                       # [Nkp, Dp]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attn_kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, nk_valid,
                      blk_q):
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    b = b_ref[0, 0].astype(jnp.float32)                   # [blk_q | 1, Nkp]
    s = s + b  # broadcasts if bias q-dim is 1
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)
    v = v_ref[0, 0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _mask_pad(s, nk_valid):
    nkp = s.shape[-1]
    if nk_valid == nkp:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=s.ndim - 1)
    return jnp.where(col < nk_valid, s, NEG_INF)


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fused_attention_fwd_impl(q, k, v, bias, scale, interpret=False):
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    blk_q = min(256, _round_up(Nq, 8))
    Nqp = _round_up(Nq, blk_q)
    Nkp = _round_up(Nk, 128)
    # Keep the head dim unpadded when it is sublane-aligned: zero-padding
    # 64→128 doubles MXU cycles for both QK^T (contraction depth) and PV
    # (output columns). Mosaic handles 64-lane tiles natively.
    Dp = D if D % 8 == 0 else _round_up(D, 128)

    # [B, H, N, D] layout with zero padding.
    def prep(x, n, npad):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, npad - n), (0, Dp - D)))

    qp = prep(q, Nq, Nqp)
    kp = prep(k, Nk, Nkp)
    vp = prep(v, Nk, Nkp)

    grid = (B, H, Nqp // blk_q)
    qspec = pl.BlockSpec((1, 1, blk_q, Dp), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, Nkp, Dp), lambda b, h, i: (b, h, 0, 0))
    ospec = pl.BlockSpec((1, 1, blk_q, Dp), lambda b, h, i: (b, h, i, 0))

    if bias is not None:
        bb, bh, bq, _ = bias.shape
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, (Nqp - bq) if bq > 1 else 0),
                              (0, Nkp - Nk)), constant_values=NEG_INF)
        bqs = blk_q if bq > 1 else 1

        def bmap(b, h, i, _bb=bb, _bh=bh, _bq=bq):
            return (b if _bb > 1 else 0, h if _bh > 1 else 0,
                    i if _bq > 1 else 0, 0)

        bspec = pl.BlockSpec((1, 1, bqs, Nkp), bmap)
        kernel = functools.partial(_attn_kernel_bias, scale=scale,
                                   nk_valid=Nk, blk_q=blk_q)
        in_specs = [qspec, kvspec, kvspec, bspec]
        args = (qp, kp, vp, bias)
    else:
        kernel = functools.partial(_attn_kernel, scale=scale, nk_valid=Nk,
                                   blk_q=blk_q)
        in_specs = [qspec, kvspec, kvspec]
        args = (qp, kp, vp)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, H, Nqp, Dp), q.dtype),
        interpret=interpret,
    )(*args)
    return jnp.swapaxes(out[:, :, :Nq, :D], 1, 2)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, nk_valid, has_bias, bias_ref=None,
                     db_ref=None, db_acc_b=False, db_acc_h=False,
                     db_q_full=True):
    """One-pass attention backward for one (b, h, q-block): recomputes
    P = softmax(QK^T·scale + bias) in VMEM, then
    dV = P^T dO; dP = dO V^T; dS = P ⊙ (dP − rowsum(P⊙dP));
    dQ = dS·K·scale; dK = dS^T·Q·scale; dB = dS."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)                                       # [blk_q, Nkp] f32

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do.astype(v.dtype), v,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # [blk_q, Nkp]
    dq = jax.lax.dot_general(ds.astype(k.dtype), k,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds.astype(q.dtype), qs,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    # dk/dv accumulate across q-blocks (grid iterates iq sequentially)
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)
    if has_bias and db_ref is not None:
        # db reduced to the bias' broadcast shape *inside* the kernel —
        # writing the full [B,H,Nq,Nk] dS to HBM dominated the backward.
        b_axis, h_axis = pl.program_id(0), pl.program_id(1)
        contrib = ds if db_q_full else jnp.sum(ds, axis=0, keepdims=True)
        init = jnp.asarray(True)
        if db_acc_b:
            init = jnp.logical_and(init, b_axis == 0)
        if db_acc_h:
            init = jnp.logical_and(init, h_axis == 0)
        if not db_q_full:
            init = jnp.logical_and(init, iq == 0)
        if db_acc_b or db_acc_h or not db_q_full:
            @pl.when(init)
            def _():
                db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

            db_ref[0, 0] += contrib.astype(db_ref.dtype)
        else:
            db_ref[0, 0] = contrib.astype(db_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, bias, scale, g, interpret=False):
    """→ (dq, dk, dv, db_full) with db_full of shape [B, H, Nq, Nk] (caller
    reduces broadcast dims). Layout mirrors the forward."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    blk_q = min(256, _round_up(Nq, 8))
    Nqp = _round_up(Nq, blk_q)
    Nkp = _round_up(Nk, 128)
    Dp = D if D % 8 == 0 else _round_up(D, 128)

    def prep(x, n, npad):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, npad - n), (0, Dp - D)))

    qp, kp, vp = prep(q, Nq, Nqp), prep(k, Nk, Nkp), prep(v, Nk, Nkp)
    gp = prep(g, Nq, Nqp)

    grid = (B, H, Nqp // blk_q)
    qspec = pl.BlockSpec((1, 1, blk_q, Dp), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, Nkp, Dp), lambda b, h, i: (b, h, 0, 0))

    out_shapes = [
        jax.ShapeDtypeStruct((B, H, Nqp, Dp), jnp.float32),  # dq
        jax.ShapeDtypeStruct((B, H, Nkp, Dp), jnp.float32),  # dk
        jax.ShapeDtypeStruct((B, H, Nkp, Dp), jnp.float32),  # dv
    ]
    out_specs = [qspec, kvspec, kvspec]

    has_bias = bias is not None
    if has_bias:
        bb, bh, bq, _ = bias.shape
        bias_p = jnp.pad(bias, ((0, 0), (0, 0),
                                (0, (Nqp - bq) if bq > 1 else 0),
                                (0, Nkp - Nk)), constant_values=NEG_INF)
        bqs = blk_q if bq > 1 else 1

        def bmap(b, h, i, _bb=bb, _bh=bh, _bq=bq):
            return (b if _bb > 1 else 0, h if _bh > 1 else 0,
                    i if _bq > 1 else 0, 0)

        bspec = pl.BlockSpec((1, 1, bqs, Nkp), bmap)
        in_specs = [qspec, kvspec, kvspec, qspec, bspec]
        args = (qp, kp, vp, gp, bias_p)
        # db in the bias' own broadcast shape, reduced in-kernel
        db_B = bb if bb > 1 else 1
        db_H = bh if bh > 1 else 1
        db_Q = Nqp if bq > 1 else 1
        out_shapes.append(
            jax.ShapeDtypeStruct((db_B, db_H, db_Q, Nkp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, bqs, Nkp), bmap))

        def kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref,
                   dv_ref, db_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                             dv_ref, scale=scale, nk_valid=Nk,
                             has_bias=True, bias_ref=bias_ref,
                             db_ref=db_ref, db_acc_b=(bb == 1),
                             db_acc_h=(bh == 1), db_q_full=(bq > 1))
    else:
        in_specs = [qspec, kvspec, kvspec, qspec]
        args = (qp, kp, vp, gp)

        def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                             dv_ref, scale=scale, nk_valid=Nk,
                             has_bias=False)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

    def unprep(x, n):
        return jnp.swapaxes(x[:, :, :n, :D], 1, 2)

    dq = unprep(outs[0], Nq).astype(q.dtype)
    dk = unprep(outs[1], Nk).astype(k.dtype)
    dv = unprep(outs[2], Nk).astype(v.dtype)
    db = None
    if has_bias:
        bq = bias.shape[2]
        db = outs[3][:, :, : (Nq if bq > 1 else 1), :Nk]
    return dq, dk, dv, db


def _xla_reference(q, k, v, bias, scale):
    # q is scaled *before* the matmul, matching both the fused kernel and the
    # reference (reference models/beit2.py:137, models/xbert.py:296-330).
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, bias=None, scale=None, interpret=False):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _fused_attention_fwd_impl(q, k, v, bias, scale, interpret)


def _fwd(q, k, v, bias, scale, interpret):
    out = flash_attention(q, k, v, bias, scale, interpret)
    return out, (q, k, v, bias)


def _bwd(scale, interpret, res, g):
    q, k, v, bias = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    dq, dk, dv, db = _fused_attention_bwd_impl(q, k, v, bias, scale, g,
                                               interpret)
    if bias is None:
        return dq, dk, dv, None
    return dq, dk, dv, db.astype(bias.dtype)


def _reduce_to_shape(x, shape):
    for ax, (have, want) in enumerate(zip(x.shape, shape)):
        if want == 1 and have != 1:
            x = jnp.sum(x, axis=ax, keepdims=True)
    return x


flash_attention.defvjp(_fwd, _bwd)
