"""Pallas fused attention for TPU.

Replaces the unfused softmax(QK^T + bias)V chain of the reference
(reference models/beit2.py:136-160, models/xbert.py:296-341) with a single
VMEM-resident kernel.

Design notes (TPU-first; v4 after profiling the v1-v3 kernels):
- X-FM sequence lengths are small (≤30-128 text tokens, ≤901 image patches +
  cls; reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml:88-89 and
  configs/xfm-ft/VQA.yaml:18). The whole K/V for one (batch, head) fits in
  VMEM, so this is a *one-pass* kernel blocked over queries — strictly less
  work than online-softmax flash attention, same memory behavior.
- `bias` is additive with broadcastable shape [1|B, 1|H, 1|Nq, Nk]: BEiT-2
  rel-pos bias arrives [1, H, N, N], padding masks [B, 1, 1, Nk]. The full
  [B, H, Nq, Nk] bias is never materialized. **Grid order is (H, iq, B)** —
  batch innermost — so the bias block's index map is constant along the
  B sweep and Mosaic keeps it VMEM-resident instead of re-DMAing ~200 KB per
  (b, h) cell (the v1-v3 kernels' dominant cost: ~236 MB of bias DMA per
  layer at B=96).
- q/k/v are read and outputs written **directly in [B, N, H, D] layout** via
  unit-dim BlockSpecs — no HBM transposes around the kernel.
- Head dim (64 for XFM-base) stays unpadded: zero-padding 64→128 doubles
  MXU cycles for QK^T and PV (measured v1 regression).
- Backward: one-pass kernel recomputing P in VMEM; dbias is reduced to the
  bias' own broadcast shape in-kernel (v3 wrote [B,H,N,N] dS to HBM and the
  write dominated).
"""
from __future__ import annotations

import functools
import os

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


def _sq(ref):
    """Load a (1, 1, n, d) block as [n, d]."""
    return ref[0, 0]


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nk_valid,
                     bias_ref=None):
    q = _sq(q_ref).astype(jnp.float32) * scale            # [blk_q, D]
    k = _sq(k_ref)                                        # [Nkp, D]
    s = jax.lax.dot_general(
        q.astype(k.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [blk_q, Nkp]
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)        # broadcasts on q
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)
    v = _sq(v_ref)                                        # [Nkp, D]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _prep(x, n, npad):
    """[B, N, H, D] → [B, H, Npad, D] (transpose + zero-pad N; D unpadded —
    64-lane tiles are native, padding to 128 doubles MXU work)."""
    x = jnp.swapaxes(x, 1, 2)
    return jnp.pad(x, ((0, 0), (0, 0), (0, npad - n), (0, 0)))


def _bias_prep(bias, Nqp, Nkp, Nk):
    bb, bh, bq, _ = bias.shape
    return jnp.pad(bias, ((0, 0), (0, 0), (0, (Nqp - bq) if bq > 1 else 0),
                          (0, Nkp - Nk)), constant_values=NEG_INF)


def _grid_order(bias):
    """Grid axis order, chosen so the axes the dbias accumulation (and the
    bias block's VMEM residency) need are innermost:

    - rel-pos bias [1,H,*,N] (or no bias): batch innermost — the per-head
      bias block stays resident across the whole B sweep, and db sums over b;
    - padding-mask bias [B,1,1,N]: heads innermost — db sums over h.
    Returns 'b_inner' or 'h_inner'."""
    if bias is not None and bias.shape[0] > 1 and bias.shape[1] == 1:
        return "h_inner"
    return "b_inner"


def _axes(order):
    """(grid_builder, to_bhi) where grid = (outer, i, inner) and to_bhi maps
    grid coords → (b, h, i)."""
    if order == "b_inner":
        return (lambda H, ni, B: (H, ni, B)), (lambda a0, i, a2: (a2, a0, i))
    return (lambda H, ni, B: (B, ni, H)), (lambda a0, i, a2: (a0, a2, i))


def _bias_spec(bias, blk_q, Nkp, order):
    bb, bh, bq, _ = bias.shape
    bqs = blk_q if bq > 1 else 1
    _, to_bhi = _axes(order)

    def bmap(a0, i, a2, _bb=bb, _bh=bh, _bq=bq):
        b, h, i = to_bhi(a0, i, a2)
        return (b if _bb > 1 else 0, h if _bh > 1 else 0,
                i if _bq > 1 else 0, 0)

    return pl.BlockSpec((1, 1, bqs, Nkp), bmap)


def _pick_blk_q(Nq: int, sub: int, cap: int = 512) -> int:
    """Largest q-block ≤ cap that minimizes padded rows: split Nq into the
    fewest blocks, then round the even split up to the sublane multiple
    (577 → 2 blocks of 304 = 608 rows, not 2×512 = 1024)."""
    if Nq <= cap:
        return _round_up(Nq, sub)
    nblk = -(-Nq // cap)
    return _round_up(-(-Nq // nblk), sub)


def _fused_attention_fwd_impl(q, k, v, bias, scale, interpret=False):
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    blk_q = _pick_blk_q(Nq, sub,
                        cap=int(os.environ.get("XFM_FWD_QBLK_CAP", "512")))
    Nqp = _round_up(Nq, blk_q)
    Nkp = _round_up(Nk, 128)

    qp = _prep(q, Nq, Nqp)
    kp = _prep(k, Nk, Nkp)
    vp = _prep(v, Nk, Nkp)

    order = _grid_order(bias)
    grid_of, to_bhi = _axes(order)
    grid = grid_of(H, Nqp // blk_q, B)

    def qmap(a0, i, a2):
        b, h, i = to_bhi(a0, i, a2)
        return (b, h, i, 0)

    def kvmap(a0, i, a2):
        b, h, _ = to_bhi(a0, i, a2)
        return (b, h, 0, 0)

    qspec = pl.BlockSpec((1, 1, blk_q, D), qmap)
    kvspec = pl.BlockSpec((1, 1, Nkp, D), kvmap)
    ospec = pl.BlockSpec((1, 1, blk_q, D), qmap)

    if bias is not None:
        bias_p = _bias_prep(bias, Nqp, Nkp, Nk)

        def kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref):
            _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, scale=scale,
                             nk_valid=Nk, bias_ref=b_ref)

        in_specs = [qspec, kvspec, kvspec,
                    _bias_spec(bias, blk_q, Nkp, order)]
        out = pl.pallas_call(
            kernel_bias,
            grid=grid,
            in_specs=in_specs,
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),
            interpret=interpret,
            **_vmem_kwargs(interpret),
        )(qp, kp, vp, bias_p)
    else:
        kernel = functools.partial(_attn_fwd_kernel, scale=scale,
                                   nk_valid=Nk)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qspec, kvspec, kvspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),
            interpret=interpret,
            **_vmem_kwargs(interpret),
        )(qp, kp, vp)
    return jnp.swapaxes(out[:, :, :Nq], 1, 2)


def _loopq_vmem_limit() -> int:
    """Per-call read of the carve-out knob (so setting XFM_KERNEL_VMEM_MB
    after import behaves like the other env knobs)."""
    return int(os.environ.get("XFM_KERNEL_VMEM_MB", "48")) * 1024 * 1024


def _vmem_kwargs(interpret):
    """Per-kernel VMEM carve-out above the 16 MB scoped default (v5e has
    128 MiB physical) — lets the long-seq q-blocks stay large."""
    if _HAS_PLTPU and not interpret:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_loopq_vmem_limit())}
    return {}


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, nk_valid, has_bias,
                     bias_ref=None, db_ref=None, db_accumulate=False,
                     db_init_axis0=False, db_init_axis1=False,
                     db_q_full=True, partial_kv=False):
    """One-pass attention backward for one (h, q-block, b): recomputes
    P = softmax(QK^T·scale + bias) in VMEM, then
    dV = P^T dO; dP = dO V^T; dS = P ⊙ (dP − rowsum(P⊙dP));
    dQ = dS·K·scale; dK = dS^T·(Q·scale); dB = dS (reduced to bias shape).

    Small sequences run a single q-block per (b, h): dk/dv are written
    once, db accumulates along the innermost B sweep while its block stays
    VMEM-resident. Long sequences (scratch wouldn't fit scoped VMEM) run
    multiple q-blocks: each block writes its dk/dv contribution to a
    per-block f32 partial slot (`partial_kv`, summed by the caller) and db
    blocks are per-(h, q-block), still B-accumulated."""
    q = _sq(q_ref)
    k = _sq(k_ref)
    v = _sq(v_ref)
    do = _sq(do_ref).astype(jnp.float32)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)                                       # [blk_q, Nkp] f32

    pb = p.astype(do_ref.dtype)
    dv = jax.lax.dot_general(pb, do.astype(pb.dtype),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do.astype(v.dtype), v,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # [blk_q, Nkp]
    dsb = ds.astype(k.dtype)
    dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsb, qs, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    if partial_kv:
        dk_ref[0, 0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, 0] = dv.astype(dv_ref.dtype)
    else:
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    if has_bias and db_ref is not None:
        contrib = ds if db_q_full else jnp.sum(ds, axis=0, keepdims=True)
        if db_accumulate:
            # db block stays VMEM-resident along the innermost grid axis
            # (and, for bias dims it is broadcast over, the outer/middle
            # axes too): init on first visit, accumulate after.
            init = pl.program_id(2) == 0
            if db_init_axis0:
                init = jnp.logical_and(init, pl.program_id(0) == 0)
            if db_init_axis1:
                init = jnp.logical_and(init, pl.program_id(1) == 0)

            @pl.when(init)
            def _():
                db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

            db_ref[0, 0] += contrib.astype(db_ref.dtype)
        else:
            db_ref[0, 0] = contrib.astype(db_ref.dtype)


def _pick_bwd_blk_q(Nq: int, Nkp: int, sub: int) -> int:
    """Single q-block when its scoped-VMEM scratch fits (the exact
    small-seq path); otherwise the largest even split that keeps ~4 f32
    score-shaped mats + double-buffered bias/db blocks under ~9 MB."""
    full = _round_up(Nq, sub)
    budget = 9 * 1024 * 1024
    if 8 * full * Nkp * 4 <= budget:
        return full
    cap = max(sub, budget // (8 * Nkp * 4) // sub * sub)
    return _pick_blk_q(Nq, sub, cap=cap)


def _pick_loopq_blk(Nq: int, Nqp_est: int, Nkp: int, D: int, sub: int,
                    has_bias: bool, bias_q_rows: bool,
                    bias_bytes: int = 4) -> int:
    """q-block size for the loop-over-q backward: the whole-cell statics
    (q/do/dq [Nqp, D], k/v/dk/dv [Nkp, D], bias input + f32 db blocks when
    the bias carries q rows) plus ~8 live f32 score-shaped mats per loop
    iteration must sit under the kernel's VMEM carve-out. With the default
    48 MiB carve-out and a bf16 bias the N=901 backward runs a SINGLE
    912-row block — measured fastest (123.2 vs 118.5 samples/s at 464×2)."""
    env = os.environ.get("XFM_BWD_QBLK")
    if env:  # explicit block size (tests / on-chip block-size A/B)
        return max(sub, int(env) // sub * sub)
    static = 3 * Nqp_est * D * 2 + 4 * Nkp * D * 4
    if has_bias:
        if bias_q_rows:
            static += Nqp_est * Nkp * (bias_bytes + 4)  # bias in + f32 db
        else:
            static += 2 * Nkp * (bias_bytes + 4)
    budget = _loopq_vmem_limit() - 4 * 1024 * 1024 - static
    cap = max(sub, budget // (8 * Nkp * 4) // sub * sub)
    return _pick_blk_q(Nq, sub, cap=cap)


def _attn_bwd_loopq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                           dv_ref, *, scale, nk_valid, blk_q, n_blocks,
                           has_bias=False, bias_ref=None, db_ref=None,
                           db_accumulate=False, db_init_axis0=False,
                           db_bq_full=True):
    """Backward for one (b, h) with the q dimension looped IN-kernel:
    dk/dv accumulate in VMEM across the q-blocks and are written exactly
    once — no per-block HBM partials (the previous long-seq scheme wrote +
    re-read 2 f32 [nq_blocks, B, H, Nkp, D] tensors ≈ 1.2 GB/layer at the
    480px VQA shape). Same math as `_attn_bwd_kernel` per block."""
    k = _sq(k_ref)
    v = _sq(v_ref)
    track_db = has_bias and db_ref is not None

    if track_db:
        if db_accumulate:
            init = pl.program_id(2) == 0
            if db_init_axis0:
                init = jnp.logical_and(init, pl.program_id(0) == 0)
        else:
            init = True  # this cell owns its db block exclusively

        @pl.when(init)
        def _():
            db_ref[0, 0] = jnp.zeros_like(db_ref[0, 0])

    # fori_loop, NOT an unrolled Python loop: Mosaic allocates scoped-VMEM
    # stack slots per *instruction*, so an unrolled loop keeps every
    # iteration's score-shaped temporaries live at once (measured 19-20 MB
    # at N=901 — over the 16 MB limit at any block size). The rolled loop
    # pays one iteration's buffers; dk/dv (and the bq==1 db row) ride the
    # carry.
    def body(i, carry):
        dk_acc, dv_acc, db_row = carry
        rows = (0, 0, pl.ds(i * blk_q, blk_q), slice(None))
        q = q_ref[rows]
        do = do_ref[rows].astype(jnp.float32)
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            brows = (bias_ref[rows] if bias_ref.shape[2] > 1
                     else bias_ref[0, 0])
            s = s + brows.astype(jnp.float32)
        s = _mask_pad(s, nk_valid)
        p = _softmax(s)

        pb = p.astype(do_ref.dtype)
        dv_acc += jax.lax.dot_general(pb, do.astype(pb.dtype),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do.astype(v.dtype), v,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dsb = ds.astype(k.dtype)
        dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dk_acc += jax.lax.dot_general(dsb, qs, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dq_ref[rows] = dq.astype(dq_ref.dtype)

        if track_db:
            if db_bq_full:
                db_ref[rows] = db_ref[rows] + ds.astype(db_ref.dtype)
            else:
                db_row += jnp.sum(ds, axis=0, keepdims=True)
        return dk_acc, dv_acc, db_row

    carry0 = (jnp.zeros((k.shape[0], k.shape[1]), jnp.float32),
              jnp.zeros((v.shape[0], v.shape[1]), jnp.float32),
              jnp.zeros((1, k.shape[0]), jnp.float32))
    dk_acc, dv_acc, db_row = jax.lax.fori_loop(0, n_blocks, body, carry0)

    if track_db and not db_bq_full:
        db_ref[0, 0] += db_row.astype(db_ref.dtype)
    dk_ref[0, 0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc.astype(dv_ref.dtype)


def _bwd_loopq(q, k, v, bias, scale, g, B, Nq, Nk, H, D, Nqp, Nkp, blk_q,
               nq_blocks, interpret):
    """Long-sequence backward dispatch: one grid cell per (b, h), q-blocks
    looped inside `_attn_bwd_loopq_kernel`. dk/dv come back f32 (single
    store per cell) and are cast outside; db handling mirrors the
    single-block path (accumulate along the innermost axis over whichever
    batch/head dims the bias broadcasts, write-once otherwise)."""
    qp = _prep(q, Nq, Nqp)
    kp = _prep(k, Nk, Nkp)
    vp = _prep(v, Nk, Nkp)
    gp = _prep(g, Nq, Nqp)

    order = _grid_order(bias)
    grid_of, to_bhi = _axes(order)
    grid = grid_of(H, 1, B)

    def qmap(a0, i, a2):
        b, h, _ = to_bhi(a0, i, a2)
        return (b, h, 0, 0)

    qspec = pl.BlockSpec((1, 1, Nqp, D), qmap)
    kvspec = pl.BlockSpec((1, 1, Nkp, D), qmap)

    out_shapes = [
        jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),     # dq
        jax.ShapeDtypeStruct((B, H, Nkp, D), jnp.float32),  # dk (f32 acc)
        jax.ShapeDtypeStruct((B, H, Nkp, D), jnp.float32),  # dv
    ]
    out_specs = [qspec, kvspec, kvspec]

    has_bias = bias is not None
    kern = functools.partial(_attn_bwd_loopq_kernel, scale=scale,
                             nk_valid=Nk, blk_q=blk_q, n_blocks=nq_blocks,
                             has_bias=has_bias)
    if has_bias:
        bb, bh, bq, _ = bias.shape
        bias_p = _bias_prep(bias, Nqp, Nkp, Nk)
        bspec = _bias_spec(bias, Nqp, Nkp, order)
        in_specs = [qspec, kvspec, kvspec, qspec, bspec]
        args = (qp, kp, vp, gp, bias_p)
        db_B = bb if bb > 1 else 1
        db_H = bh if bh > 1 else 1
        db_Q = Nqp if bq > 1 else 1
        out_shapes.append(
            jax.ShapeDtypeStruct((db_B, db_H, db_Q, Nkp), jnp.float32))
        out_specs.append(bspec)

        def kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref,
                   dv_ref, db_ref):
            kern(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                 bias_ref=bias_ref, db_ref=db_ref,
                 db_accumulate=(bb == 1 or bh == 1),
                 db_init_axis0=(bb == 1 and bh == 1),
                 db_bq_full=(bq > 1))
    else:
        in_specs = [qspec, kvspec, kvspec, qspec]
        args = (qp, kp, vp, gp)

        def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
            kern(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref)

    kwargs = _vmem_kwargs(interpret)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )(*args)

    def unprep(x, n):
        return jnp.swapaxes(x[:, :, :n], 1, 2)

    dq = unprep(outs[0], Nq)
    dk = unprep(outs[1].astype(k.dtype), Nk)
    dv = unprep(outs[2].astype(v.dtype), Nk)
    db = None
    if has_bias:
        bq = bias.shape[2]
        db = outs[3][:, :, : (Nq if bq > 1 else 1), :Nk]
    return dq, dk, dv, db


def _fused_attention_bwd_impl(q, k, v, bias, scale, g, interpret=False):
    """→ (dq, dk, dv, db) with db already reduced to the bias' broadcast
    shape (padded cols trimmed). Layout mirrors the forward. Long
    sequences (N ≳ 600) split the q dimension into blocks: dk/dv come back
    as per-block f32 partials summed here, db blocks are per-(h, q-block)
    and still accumulate along the innermost batch sweep."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Nkp = _round_up(Nk, 128)
    blk_q = _pick_bwd_blk_q(Nq, Nkp, sub)
    Nqp = _round_up(Nq, blk_q)
    nq_blocks = Nqp // blk_q
    multi_q = nq_blocks > 1
    # long sequences default to the loop-over-q kernel (dk/dv accumulated
    # in VMEM, written once); XFM_BWD_PARTIALS=1 restores the HBM-partials
    # scheme for A/B
    loopq = multi_q and os.environ.get("XFM_BWD_PARTIALS", "0") != "1"
    if loopq:
        bias_q_rows = bias is not None and bias.shape[2] > 1
        blk_q = _pick_loopq_blk(Nq, Nqp, Nkp, D, sub,
                                bias is not None, bias_q_rows,
                                bias.dtype.itemsize if bias is not None
                                else 4)
        Nqp = _round_up(Nq, blk_q)
        nq_blocks = Nqp // blk_q
        return _bwd_loopq(q, k, v, bias, scale, g, B, Nq, Nk, H, D,
                          Nqp, Nkp, blk_q, nq_blocks, interpret)

    qp = _prep(q, Nq, Nqp)
    kp = _prep(k, Nk, Nkp)
    vp = _prep(v, Nk, Nkp)
    gp = _prep(g, Nq, Nqp)

    order = _grid_order(bias)
    grid_of, to_bhi = _axes(order)
    grid = grid_of(H, nq_blocks, B)

    def qmap(a0, i, a2):
        b, h, i = to_bhi(a0, i, a2)
        return (b, h, i, 0)

    def kvmap(a0, i, a2):
        b, h, _ = to_bhi(a0, i, a2)
        return (b, h, 0, 0)

    qspec = pl.BlockSpec((1, 1, blk_q, D), qmap)
    kvspec = pl.BlockSpec((1, 1, Nkp, D), kvmap)

    if multi_q:
        # per-q-block dk/dv partials (write-once, f32 — summed below);
        # a dk block keyed (b, h) would be revisited NON-contiguously
        # across the middle q-block axis, which Pallas accumulation does
        # not support
        def pkvmap(a0, i, a2):
            b, h, i = to_bhi(a0, i, a2)
            return (i, b, h, 0, 0)

        kv_out_spec = pl.BlockSpec((1, 1, 1, Nkp, D), pkvmap)
        kv_shape = jax.ShapeDtypeStruct((nq_blocks, B, H, Nkp, D),
                                        jnp.float32)
    else:
        kv_out_spec = kvspec
        kv_shape = jax.ShapeDtypeStruct((B, H, Nkp, D), k.dtype)

    # input-dtype grad outputs (single store per block, no accumulation):
    # bit-identical to writing f32 and casting after, half the HBM writes
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),   # dq
        kv_shape,                                        # dk
        jax.ShapeDtypeStruct(kv_shape.shape, kv_shape.dtype),  # dv
    ]
    out_specs = [qspec, kv_out_spec, kv_out_spec]

    has_bias = bias is not None
    if has_bias:
        bb, bh, bq, _ = bias.shape
        if multi_q and bq == 1 and bb > 1 and bh > 1:
            # full [B, H, 1, Nk] bias with a blocked q dim: db would need
            # non-contiguous accumulation — no shipped model hits this;
            # route through the XLA composition instead
            raise NotImplementedError(
                "blocked-q backward with a per-(batch, head) broadcast "
                "bias is unsupported; disable the flash kernel here")
        bias_p = _bias_prep(bias, Nqp, Nkp, Nk)
        bspec = _bias_spec(bias, blk_q, Nkp, order)
        in_specs = [qspec, kvspec, kvspec, qspec, bspec]
        args = (qp, kp, vp, gp, bias_p)
        db_B = bb if bb > 1 else 1
        db_H = bh if bh > 1 else 1
        db_Q = Nqp if bq > 1 else 1
        out_shapes.append(
            jax.ShapeDtypeStruct((db_B, db_H, db_Q, Nkp), jnp.float32))
        out_specs.append(bspec)

        def kernel(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref,
                   dv_ref, db_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                             dv_ref, scale=scale, nk_valid=Nk,
                             has_bias=True, bias_ref=bias_ref,
                             db_ref=db_ref,
                             db_accumulate=(bb == 1 or bh == 1),
                             db_init_axis0=(bb == 1 and bh == 1),
                             db_init_axis1=(bq == 1 and multi_q),
                             db_q_full=(bq > 1), partial_kv=multi_q)
    else:
        in_specs = [qspec, kvspec, kvspec, qspec]
        args = (qp, kp, vp, gp)

        def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                             dv_ref, scale=scale, nk_valid=Nk,
                             has_bias=False, partial_kv=multi_q)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

    def unprep(x, n):
        return jnp.swapaxes(x[:, :, :n], 1, 2)

    dq = unprep(outs[0], Nq)
    if multi_q:
        dk = unprep(outs[1].sum(axis=0).astype(k.dtype), Nk)
        dv = unprep(outs[2].sum(axis=0).astype(v.dtype), Nk)
    else:
        dk = unprep(outs[1], Nk)
        dv = unprep(outs[2], Nk)
    db = None
    if has_bias:
        bq = bias.shape[2]
        db = outs[3][:, :, : (Nq if bq > 1 else 1), :Nk]
    return dq, dk, dv, db


# ---------------------------------------------------------------------------
# In-kernel rel-pos bias: the long-sequence BEiT self-attention path.
#
# At 480px (N=901) the rel-pos bias is [H, 901, 901] — materializing it in
# HBM costs ~12 ms/step of construction (the (a,ci)/(b,cj) interleave
# transpose + its AD mirror, PERF.md round-4 floor decomposition) plus the
# kernel bias DMA, and the backward writes a [H, 901, 1024] f32 db tensor
# (~45 MB/layer) that XLA then reduces through the construction transpose.
# But the bias is block-Toeplitz: only (2wh-1)·ww·ww distinct values per
# head (ops/relpos.py compact_rel_pos). These kernels take the compact
# [H, ww, (2wh-1)·ww] form (~150 KB/head at 480px), expand it ONCE per
# head into a VMEM scratch that stays resident across the batch sweep, and
# accumulate the bias gradient back into the compact form in VMEM — the
# full-size bias never touches HBM in either direction.
# ---------------------------------------------------------------------------


def _relpos_scr_build(cr_ref, cls_ref, bias_scr, h, *, wh, ww):
    """Expand compact rel-pos into the [Nqp, Nkp] bias scratch.

    Layout (reference models/beit2.py:99-116): row 0 = [cls→cls,
    cls→patch…], col 0 of rows 1… = patch→cls, rows 1+a·ww…: stripe a =
    the contiguous cr lane slice at offset (wh-1-a)·ww. Padded rows/cols
    hold 0 (cols are NEG_INF-masked after the bias add; padded q rows have
    zero dO). cls_ref is the whole [H, 4] SMEM table (Mosaic requires SMEM
    blocks be full-array or (8,128)-divisible), indexed by the h grid axis
    (`h` is passed in: program_id is not interpretable inside pl.when)."""
    c2a = cls_ref[h, 0]
    a2c = cls_ref[h, 1]
    cc = cls_ref[h, 2]
    nqp, nkp = bias_scr.shape
    p = wh * ww
    col = jax.lax.broadcasted_iota(jnp.int32, (nqp, nkp), 1)
    bias_scr[:, :] = jnp.where(col == 0, a2c, 0.0).astype(bias_scr.dtype)
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, nkp), 1)
    bias_scr[0:1, :] = jnp.where(col1 == 0, cc, c2a).astype(bias_scr.dtype)
    for a in range(wh):
        off = (wh - 1 - a) * ww
        bias_scr[1 + a * ww: 1 + (a + 1) * ww, 1: 1 + p] = \
            cr_ref[0, :, off: off + p]


def _pad_d(x):
    """Zero-pad the head dim 64→128 for the score contraction
    (XFM_PAD_SCORE_K experiment: a [*, 64] contraction half-fills the MXU
    K dim; padded fills it — measured −8.4% on isolated score matmuls,
    PERF.md round-4 head-dim packing table)."""
    return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)


def _relpos_fwd_kernel(cls_ref, q_ref, k_ref, v_ref, cr_ref, o_ref,
                       bias_scr, *, scale, nk_valid, wh, ww, blk_q,
                       pad_score_k=False):
    h = pl.program_id(0)
    iq = pl.program_id(1)

    @pl.when(jnp.logical_and(iq == 0, pl.program_id(2) == 0))
    def _():
        _relpos_scr_build(cr_ref, cls_ref, bias_scr, h, wh=wh, ww=ww)

    q = _sq(q_ref).astype(jnp.float32) * scale
    k = _sq(k_ref)
    qq, kk = (q.astype(k.dtype), k)
    if pad_score_k:
        qq, kk = _pad_d(qq), _pad_d(kk)
    s = jax.lax.dot_general(qq, kk,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_scr[pl.ds(iq * blk_q, blk_q), :].astype(jnp.float32)
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)
    v = _sq(v_ref)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _relpos_bwd_kernel(cls_ref, q_ref, k_ref, v_ref, do_ref, cr_ref,
                       dq_ref, dk_ref, dv_ref, dcr_ref, dcls_ref,
                       bias_scr, ds_scr, *, scale, nk_valid, wh, ww,
                       pad_score_k=False):
    """Whole-q backward for one (h, b): ds accumulates into a VMEM scratch
    across the batch sweep; on the last batch row the scratch is folded
    into the compact dcr/dcls outputs (the exact transpose of the stripe
    expansion — overlapping lane ranges accumulate)."""
    h = pl.program_id(0)
    b = pl.program_id(2)
    b_last = pl.num_programs(2) - 1

    @pl.when(b == 0)
    def _():
        _relpos_scr_build(cr_ref, cls_ref, bias_scr, h, wh=wh, ww=ww)

    q = _sq(q_ref)
    k = _sq(k_ref)
    v = _sq(v_ref)
    do = _sq(do_ref).astype(jnp.float32)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qsk, kk = (qs, k)
    if pad_score_k:
        qsk, kk = _pad_d(qs), _pad_d(k)
    s = jax.lax.dot_general(qsk, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_scr[:, :].astype(jnp.float32)
    s = _mask_pad(s, nk_valid)
    p = _softmax(s)

    pb = p.astype(do_ref.dtype)
    dv = jax.lax.dot_general(pb, do.astype(pb.dtype),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dov, vv = (do.astype(v.dtype), v)
    if pad_score_k:
        dov, vv = _pad_d(dov), _pad_d(vv)
    dp = jax.lax.dot_general(dov, vv,
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(k.dtype)
    dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsb, qs, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        ds_scr[:, :] = ds

    @pl.when(b > 0)
    def _():
        ds_scr[:, :] += ds

    @pl.when(b == b_last)
    def _():
        dsm = ds_scr[:, :]
        p_ = wh * ww
        dcr_ref[0] = jnp.zeros_like(dcr_ref[0])
        for a in range(wh):
            off = (wh - 1 - a) * ww
            dcr_ref[0, :, off: off + p_] += \
                dsm[1 + a * ww: 1 + (a + 1) * ww, 1: 1 + p_]
        dcc = jnp.sum(dsm[0:1, 0:1])
        dc2a = jnp.sum(dsm[0:1, 1: 1 + p_])
        da2c = jnp.sum(dsm[1: 1 + p_, 0:1])
        # dcls block is [1, 8, 128] (Mosaic min-tile); values live in row 0
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        vals = (jnp.where(lane == 0, dc2a, 0.0)
                + jnp.where(lane == 1, da2c, 0.0)
                + jnp.where(lane == 2, dcc, 0.0))
        dcls_ref[0] = jnp.where(row == 0, vals, 0.0)


def _relpos_shapes(q, window):
    B, Nq, H, D = q.shape
    wh, ww = window
    if Nq != wh * ww + 1:
        raise ValueError(f"relpos kernel needs N == wh*ww+1, got {Nq} vs "
                         f"{window}")
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Nkp = _round_up(Nq, 128)
    L = (2 * wh - 1) * ww
    Lp = _round_up(L, 128)
    return B, Nq, H, D, wh, ww, sub, Nkp, L, Lp


def _relpos_pack_tables(cr, cls3, H, ww, L, Lp):
    crp = jnp.pad(cr, ((0, 0), (0, 0), (0, Lp - L)))
    clsp = jnp.pad(cls3.astype(jnp.float32), ((0, 0), (0, 1)))  # [H, 4]
    return crp, clsp


def _relpos_fwd_impl(q, k, v, cr, cls3, scale, window, interpret=False):
    B, Nq, H, D, wh, ww, sub, Nkp, L, Lp = _relpos_shapes(q, window)
    blk_q = _pick_blk_q(Nq, sub,
                        cap=int(os.environ.get("XFM_FWD_QBLK_CAP", "512")))
    Nqp = _round_up(Nq, blk_q)
    qp = _prep(q, Nq, Nqp)
    kp = _prep(k, Nq, Nkp)
    vp = _prep(v, Nq, Nkp)
    crp, clsp = _relpos_pack_tables(cr, cls3, H, ww, L, Lp)

    grid = (H, Nqp // blk_q, B)
    qspec = pl.BlockSpec((1, 1, blk_q, D), lambda h, i, b: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, Nkp, D), lambda h, i, b: (b, h, 0, 0))
    crspec = pl.BlockSpec((1, ww, Lp), lambda h, i, b: (h, 0, 0))
    if _HAS_PLTPU:
        clsspec = pl.BlockSpec((H, 4), lambda h, i, b: (0, 0),
                               memory_space=pltpu.SMEM)
        scr = pltpu.VMEM((Nqp, Nkp), cr.dtype)
    else:  # pragma: no cover - CPU without the TPU pallas backend
        raise NotImplementedError("relpos kernel needs pallas TPU backend")

    out = pl.pallas_call(
        functools.partial(_relpos_fwd_kernel, scale=scale, nk_valid=Nq,
                          wh=wh, ww=ww, blk_q=blk_q,
                          pad_score_k=os.environ.get(
                              "XFM_PAD_SCORE_K", "0") == "1"),
        grid=grid,
        in_specs=[clsspec, qspec, kvspec, kvspec, crspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),
        scratch_shapes=[scr],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(clsp, qp, kp, vp, crp)
    return jnp.swapaxes(out[:, :, :Nq], 1, 2)


def _relpos_bwd_impl(q, k, v, cr, cls3, scale, window, g, interpret=False):
    B, Nq, H, D, wh, ww, sub, Nkp, L, Lp = _relpos_shapes(q, window)
    Nqp = _round_up(Nq, sub)  # single whole-q block
    qp = _prep(q, Nq, Nqp)
    kp = _prep(k, Nq, Nkp)
    vp = _prep(v, Nq, Nkp)
    gp = _prep(g, Nq, Nqp)
    crp, clsp = _relpos_pack_tables(cr, cls3, H, ww, L, Lp)

    grid = (H, 1, B)
    qspec = pl.BlockSpec((1, 1, Nqp, D), lambda h, i, b: (b, h, 0, 0))
    kvspec = pl.BlockSpec((1, 1, Nkp, D), lambda h, i, b: (b, h, 0, 0))
    crspec = pl.BlockSpec((1, ww, Lp), lambda h, i, b: (h, 0, 0))
    clsspec = pl.BlockSpec((H, 4), lambda h, i, b: (0, 0),
                           memory_space=pltpu.SMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),      # dq
        jax.ShapeDtypeStruct((B, H, Nkp, D), jnp.float32),  # dk
        jax.ShapeDtypeStruct((B, H, Nkp, D), jnp.float32),  # dv
        jax.ShapeDtypeStruct((H, ww, Lp), jnp.float32),     # dcr
        jax.ShapeDtypeStruct((H, 8, 128), jnp.float32),     # dcls (row 0)
    ]
    out_specs = [qspec, kvspec, kvspec, crspec,
                 pl.BlockSpec((1, 8, 128), lambda h, i, b: (h, 0, 0))]

    outs = pl.pallas_call(
        functools.partial(_relpos_bwd_kernel, scale=scale, nk_valid=Nq,
                          wh=wh, ww=ww,
                          pad_score_k=os.environ.get(
                              "XFM_PAD_SCORE_K", "0") == "1"),
        grid=grid,
        in_specs=[clsspec, qspec, kvspec, kvspec, qspec, crspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((Nqp, Nkp), cr.dtype),
                        pltpu.VMEM((Nqp, Nkp), jnp.float32)],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(clsp, qp, kp, vp, gp, crp)

    def unprep(x, n):
        return jnp.swapaxes(x[:, :, :n], 1, 2)

    dq = unprep(outs[0], Nq)
    dk = unprep(outs[1].astype(k.dtype), Nq)
    dv = unprep(outs[2].astype(v.dtype), Nq)
    dcr = outs[3][:, :, :L]
    dcls = outs[4][:, 0, :3]
    return dq, dk, dv, dcr, dcls


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _relpos_core(q, k, v, crf, cls3, scale, window, interpret=False):
    """Fused self-attention with the rel-pos bias expanded in VMEM.

    q/k/v: [B, N, H, D] with N == wh·ww + 1. crf: compact bias
    [H, ww, (2wh-1)·ww] (ops/relpos.py compact_rel_pos, flattened).
    cls3: [H, 3] f32 (cls→patch, patch→cls, cls→cls). → [B, N, H·D-shaped
    [B, N, H, D]]."""
    return _relpos_fwd_impl(q, k, v, crf, cls3, scale, window, interpret)


def _relpos_core_fwd(q, k, v, crf, cls3, scale, window, interpret):
    out = _relpos_core(q, k, v, crf, cls3, scale, window, interpret)
    return out, (q, k, v, crf, cls3)


def _relpos_core_bwd(scale, window, interpret, res, g):
    q, k, v, crf, cls3 = res
    dq, dk, dv, dcr, dcls = _relpos_bwd_impl(q, k, v, crf, cls3, scale,
                                             window, g, interpret)
    return dq, dk, dv, dcr.astype(crf.dtype), dcls.astype(cls3.dtype)


_relpos_core.defvjp(_relpos_core_fwd, _relpos_core_bwd)


def beit_attention_relpos(q, k, v, table, window, scale,
                          bias_dtype=jnp.float32, interpret=False):
    """BEiT self-attention with in-kernel rel-pos bias expansion.

    `table`: [(2wh-1)(2ww-1)+3, H] per-block rel-pos table (reference
    models/beit2.py:92-116). Numerics match flash_attention with
    beit_rel_pos_bias(table, window, bias_dtype): the compact form is
    rounded to `bias_dtype` once (same values the full bias would hold)
    and the kernel upcasts exactly when adding to the f32 scores. The
    table gradient flows through compact_rel_pos by JAX AD — no
    [H, N, N] db tensor, no scatter."""
    from .relpos import compact_rel_pos

    wh, ww = window
    cr, cls3 = compact_rel_pos(table, wh, ww)
    cr = cr.astype(bias_dtype)
    # round cls entries exactly as the materialized bias would
    cls3 = cls3.astype(bias_dtype).astype(jnp.float32)
    H = q.shape[2]
    crf = cr.reshape(H, ww, (2 * wh - 1) * ww)
    return _relpos_core(q, k, v, crf, cls3, scale, window, interpret)


def relpos_inkernel_ok(n: int, window) -> bool:
    """Dispatch predicate for the in-kernel rel-pos path: long sequences
    on the TPU backend where the unpacked flash kernel would run anyway
    (the N=197 packed kernel keeps its materialized-bias scheme — the
    construction is cheap at 224px). XFM_INKERNEL_RELPOS=0 restores the
    materialized-bias kernels for A/B."""
    if os.environ.get("XFM_INKERNEL_RELPOS", "1") != "1":
        return False
    if os.environ.get("XFM_DISABLE_FLASH", "0") == "1":
        return False
    if not (_HAS_PLTPU and _on_tpu_cached()):
        return False
    wh, ww = window
    return n == wh * ww + 1 and n >= 512


# ---------------------------------------------------------------------------
# Packed-qkv kernel: the BEiT self-attention hot path.
#
# Input is the fused qkv projection's output [B, N, 3C] (C = H·D) — exactly
# what the qkv Dense produces. Each grid cell handles `hpb` heads whose lanes
# form one 128-wide window of the packed tensor, so q/k/v are never split,
# reshaped, or transposed in HBM (profiled at ~25 ms/step of layout copies
# for the XLA path at B=96). Grid order keeps the rel-pos bias block
# VMEM-resident across the whole batch sweep.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(qkv_q, qkv_k, qkv_v, b_ref, o_ref, *, scale,
                       nk_valid, hpb, D, G, nq):
    # q rows beyond `nq` (valid rows sublane-rounded) are zero padding whose
    # outputs are sliced away by the caller — skip their score/softmax/PV
    # work entirely (197-patch vision: 256 → 208 computed rows).
    for g in range(G):
        for j in range(hpb):
            sl = slice(j * D, (j + 1) * D)
            q = qkv_q[g, 0:nq, sl].astype(jnp.float32) * scale  # [nq, D]
            k = qkv_k[g, :, sl]                                 # [Nkp, D]
            s = jax.lax.dot_general(q.astype(k.dtype), k,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            b = b_ref[0, j]
            s = s + (b[0:nq] if b.shape[0] > 1 else b).astype(jnp.float32)
            s = _mask_pad(s, nk_valid)
            p = _softmax(s)
            v = qkv_v[g, :, sl]
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[g, 0:nq, sl] = o.astype(o_ref.dtype)


def _packed_bwd_kernel(qkv_q, qkv_k, qkv_v, do_ref, b_ref, dq_ref, dk_ref,
                       dv_ref, db_ref, *, scale, nk_valid, hpb, D, G,
                       db_init_axis0, nq):
    # Rows beyond `nq` are zero padding: their dO is zero, so they contribute
    # nothing to dk/dv/db and their dq is sliced away — compute only the
    # valid (sublane-rounded) q rows.
    for g in range(G):
        for j in range(hpb):
            sl = slice(j * D, (j + 1) * D)
            q = qkv_q[g, 0:nq, sl]
            k = qkv_k[g, :, sl]
            v = qkv_v[g, :, sl]
            do = do_ref[g, 0:nq, sl].astype(jnp.float32)

            qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            b = b_ref[0, j]
            s = s + (b[0:nq] if b.shape[0] > 1 else b).astype(jnp.float32)
            s = _mask_pad(s, nk_valid)
            p = _softmax(s)

            pb = p.astype(do_ref.dtype)
            dv = jax.lax.dot_general(pb, do.astype(pb.dtype),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do.astype(v.dtype), v,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
            dsb = ds.astype(k.dtype)
            dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) \
                * scale
            dk = jax.lax.dot_general(dsb, qs, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

            dq_ref[g, 0:nq, sl] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[g, :, sl] = dv.astype(dv_ref.dtype)

            init = pl.program_id(2) == 0
            if db_init_axis0:
                init = jnp.logical_and(init, pl.program_id(0) == 0)

            @pl.when(jnp.logical_and(init, g == 0))
            def _():
                db_ref[0, j] = jnp.zeros_like(db_ref[0, j])

            # packed path implies rel-pos bias: full q rows (bq > 1), so the
            # db block has `nq`-addressable rows; the padded tail stays zero.
            db_ref[0, j, 0:nq] += ds.astype(db_ref.dtype)


def _tight_pad() -> bool:
    # default on: +1.3% end-to-end (254.8 → 258.1 samples/s, PERF.md);
    # XFM_PACKED_TIGHT=0 restores the 128-multiple kv padding
    import os

    return os.environ.get("XFM_PACKED_TIGHT", "1") == "1"


def _pick_g(B: int, Np: int, bwd: bool = False, hpb: int = 2) -> int:
    """Batch rows per grid cell: amortizes per-cell overhead (measured
    ~1.4 us/cell vs ~0.1 us of matmul at B-per-cell=1, PERF.md). Largest
    divisor of B that keeps the cell inside VMEM. The G x hpb loop is
    unrolled, so Mosaic's scoped-vmem stack grows with G — the backward's
    ~2.6 MB/row of live intermediates caps its G lower than the forward's."""
    import os

    env = os.environ.get("XFM_PACKED_G_BWD" if bwd else "XFM_PACKED_G")
    if env:
        g = int(env)
        return g if g >= 1 and B % g == 0 else 1
    budget = 4 * 1024 * 1024  # qkv+out blocks; x2 double-buffered by Mosaic
    # bwd G=8 blew scoped vmem (21 MB) while dq/dk/dv were written f32;
    # input-dtype grad outputs shrink the live stores and G=8 both fits and
    # measures fastest (250.8 vs 249.7 samples/s at G=4; G=12 ties, PERF.md)
    cap = 8 if bwd else 16
    # scoped-vmem stack model for the unrolled G x hpb loop's f32
    # score-shaped intermediates (s/p/dp/ds in bwd, s/p in fwd). Calibrated
    # on the known-good N=197 configs (bwd G=8, fwd G=16 fit) and the
    # measured N=577 bwd overflow (G=4 x hpb=2 hit 18.3 MB vs the 16 MB
    # stack limit): bwd limit 12 MB, fwd 24 MB under this (pessimistic)
    # 4-live / 2-live per-iteration count.
    live_limit = (12 if bwd else 24) * 1024 * 1024
    per_iter = Np * Np * 4 * (4 if bwd else 2)
    for g in (16, 12, 8, 6, 4, 3, 2, 1):
        if g > cap or B % g:
            continue
        if 4 * g * Np * 128 * 2 > budget and g > 1:
            continue
        if g * hpb * per_iter > live_limit and g > 1:
            continue
        return g
    return 1


def _packed_shapes(B, N, C3, H, dtype):
    C = C3 // 3
    D = C // H
    hpb = max(1, 128 // D)           # heads per 128-lane window
    sub = 16 if dtype == jnp.bfloat16 else 8
    Np = _round_up(N, max(sub, 8))
    Nkp = _round_up(N, 128)
    return C, D, hpb, Np, Nkp


def _packed_specs(B, Np, Nkp, C, D, hpb, H, G):
    """in-specs reading q/k/v 128-lane windows straight from [B, Np, 3C]."""
    W = hpb * D  # lane window

    def sec_map(section):
        def m(hp, i, b):
            return (b, 0, section * (C // W) + hp)

        return m

    blk = (G, Np, W)
    return [pl.BlockSpec(blk, sec_map(s)) for s in (0, 1, 2)]


def _packed_fwd_impl(qkv, bias, scale, H, interpret=False):
    B, N, C3 = qkv.shape
    C, D, hpb, Np, Nkp = _packed_shapes(B, N, C3, H, qkv.dtype)
    # pad N to both the sublane multiple and the kv lane multiple: scores
    # matrices want Nk padded to 128; q rows only need sublane alignment,
    # but a single padded length keeps one input buffer. The kernel still
    # computes only `nq` q rows (the sublane-rounded valid count) — at
    # N=197 that trims every score/softmax/PV row block 256 → 208.
    # XFM_PACKED_TIGHT=1 keeps the buffers at the sublane-rounded length
    # (208 at N=197): ~19% less qkv/out DMA per cell, at the cost of
    # non-128-multiple score lanes (Mosaic masks the register tail).
    nq = Np
    if not _tight_pad():
        Np = max(Np, Nkp)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))

    G = _pick_g(B, Np, hpb=hpb)
    grid = (H // hpb, 1, B // G)  # batch innermost: bias block stays resident
    in_specs = _packed_specs(B, Np, Nkp, C, D, hpb, H, G)

    bias_p = _bias_prep(bias, Np, Np, N)  # [1|B, H, Np|1, Np]
    bb, bh, bq, _ = bias.shape
    bqs = Np if bq > 1 else 1

    def bmap(hp, i, b):
        return (b if bb > 1 else 0, hp if bh > 1 else 0, 0, 0)

    bspec = pl.BlockSpec((1, hpb if bh > 1 else 1, bqs, Np), bmap)

    ospec = pl.BlockSpec((G, Np, hpb * D), lambda hp, i, b: (b, 0, hp))

    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, nk_valid=N,
                          hpb=hpb, D=D, G=G, nq=nq),
        grid=grid,
        in_specs=in_specs + [bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, bias_p)
    return out[:, :N]


def _packed_bwd_impl(qkv, bias, scale, H, g, interpret=False):
    B, N, C3 = qkv.shape
    C, D, hpb, Np, Nkp = _packed_shapes(B, N, C3, H, qkv.dtype)
    nq = Np
    if not _tight_pad():
        Np = max(Np, Nkp)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, Np - N), (0, 0)))

    G = _pick_g(B, Np, bwd=True, hpb=hpb)
    grid = (H // hpb, 1, B // G)
    in_specs = _packed_specs(B, Np, Nkp, C, D, hpb, H, G)
    gspec = pl.BlockSpec((G, Np, hpb * D), lambda hp, i, b: (b, 0, hp))

    bias_p = _bias_prep(bias, Np, Np, N)
    bb, bh, bq, _ = bias.shape
    bqs = Np if bq > 1 else 1

    def bmap(hp, i, b):
        return (b if bb > 1 else 0, hp if bh > 1 else 0, 0, 0)

    bspec = pl.BlockSpec((1, hpb if bh > 1 else 1, bqs, Np), bmap)

    db_B = bb if bb > 1 else 1
    db_H = bh  # per-head rows (the packed path is for rel-pos bias, bh == H)
    # dq/dk/dv are written once per cell (disjoint windows, no accumulation):
    # emit them at input dtype straight from the kernel — bit-identical to
    # writing f32 and casting after (the in-kernel astype does the same
    # rounding) but halves the dq/dk/dv HBM writes and kills the convert
    # pass. db stays f32: it ACCUMULATES across grid cells.
    out_shapes = [
        jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),     # dq
        jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),     # dk
        jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),     # dv
        jax.ShapeDtypeStruct((db_B, db_H, bqs, Np), jnp.float32),
    ]
    out_specs = [gspec, gspec, gspec, bspec]

    outs = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, nk_valid=N,
                          hpb=hpb, D=D, G=G, db_init_axis0=False, nq=nq),
        grid=grid,
        in_specs=in_specs + [gspec, bspec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, gp, bias_p)

    dqkv = jnp.concatenate([o[:, :N] for o in outs[:3]], axis=-1)
    db = outs[3][:, :, : (N if bq > 1 else 1), :N]
    return dqkv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_attention_packed(qkv, bias, scale, num_heads, interpret=False):
    """Fused attention over the packed qkv projection output.

    qkv: [B, N, 3·H·D] (layout [q ‖ k ‖ v], heads contiguous inside each
    section — the fused qkv Dense layout). bias: [1|B, H, N|1, N] additive
    (rel-pos bias and/or padding mask). → [B, N, H·D]."""
    return _packed_fwd_impl(qkv, bias, scale, num_heads, interpret)


def _packed_fwd_rule(qkv, bias, scale, num_heads, interpret):
    out = flash_attention_packed(qkv, bias, scale, num_heads, interpret)
    return out, (qkv, bias)


def _packed_bwd_rule(scale, num_heads, interpret, res, g):
    qkv, bias = res
    dqkv, db = _packed_bwd_impl(qkv, bias, scale, num_heads, g, interpret)
    bb, bh, bq, _ = bias.shape
    if bh == 1:  # kernel produced per-head rows; reduce to the bias shape
        db = jnp.sum(db, axis=1, keepdims=True)
    return dqkv, db.astype(bias.dtype)


flash_attention_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)


def packed_ok(qkv_shape, num_heads, bias, dtype) -> bool:
    """Static dispatch predicate for the packed kernel."""
    import os

    if os.environ.get("XFM_DISABLE_FLASH", "0") == "1":
        return False
    if os.environ.get("XFM_PACKED_ATTN", "1") != "1":
        return False
    if not (_HAS_PLTPU and _on_tpu_cached()):
        return False
    if bias is None:
        return False
    # kernel covers the rel-pos-bias self-attention shape: one shared bias
    # over batch, one row per head (db accumulation relies on bb == 1)
    if bias.shape[0] != 1 or bias.shape[1] != num_heads:
        return False
    B, N, C3 = qkv_shape
    C = C3 // 3
    if C % num_heads:
        return False
    D = C // num_heads
    hpb = max(1, 128 // D)
    if D % 8 or 128 % D or num_heads % hpb:
        return False
    # Scoped-VMEM budget for the BACKWARD (the binding side): per grid cell
    # it holds an hpb-head bias block + the matching f32 db block + ≥4
    # score-shaped scratch mats. Measured: N=577 (Np=592) hit 16.8-18.3 MB
    # against the 16 MB stack even at G=1 → reject past ~N=500 and let the
    # q-blocked unpacked kernel take over.
    sub = 16 if dtype == jnp.bfloat16 else 8
    Np = _round_up(N, sub) if _tight_pad() else _round_up(N, 128)
    if (2 * hpb + 4) * Np * Np * 4 > 9 * 1024 * 1024:
        return False
    return True


@functools.lru_cache(maxsize=1)
def _on_tpu_cached() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


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


flash_attention.defvjp(_fwd, _bwd)
