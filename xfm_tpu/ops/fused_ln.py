"""Fused (residual-add +) LayerNorm Pallas kernel.

Motivation (PERF.md): the pretrain step is HBM-bandwidth bound — profiler
leaf time is dominated by operand-streaming DMAs — and XLA lowers the
ubiquitous `LN(x + y)` / pre-LN residual pattern as separate fusions:
add (read x,y / write xn), stats reduce (read xn), normalize (read xn /
write h) = 4 reads + 2 writes. One kernel does it in 2 reads + 2 writes;
the backward saves another ~2 reads by recomputing row stats from the
saved sum instead of a second reduce pipeline.

Scope kept deliberately minimal: LayerScale / DropPath / dropout multiplies
stay OUTSIDE (XLA fuses those [C]- or [B,1,1]-broadcast multiplies into the
producing matmul epilogue for free), so the kernel is exactly

    xn = x + y          (y optional)
    h  = (xn - mean) * rsqrt(var + eps) * gamma + beta

with cotangents dx = dy = dxn_direct + LN-backward(dh), making the
residual-branch gradient literally the same array as dx.

Used by models/text_encoder.py (post-LN `LN(out + hidden)`, reference
models/xbert.py BertSelfOutput/BertOutput) and models/beit2.py (pre-LN
residual into norm2, reference models/beit2.py:202-215). Mirrors the
dispatch pattern of ops/flash_attention.py: Pallas on TPU, jnp fallback
(identical math) elsewhere.

MEASURED OUTCOME (see `fused_ln_ok`): the kernel is a net end-to-end
regression on the pretrain step, so the Pallas path is opt-in
(XFM_FUSED_LN=1) and the default is the jnp composition, which XLA fuses
at least as well as hand-written kernels at these (N=197/T=30, C=768)
shapes. The custom_vjp is kept either way — its backward recomputes row
stats instead of saving probs-style residuals, which is what the opt-in
path needs and costs nothing when off.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised only on TPU images
    from jax.experimental import pallas as pl
    import jax.experimental.pallas.tpu as pltpu  # noqa: F401
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_ROWS_PER_BLOCK = 512


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_ln_ok(shape, dtype) -> bool:
    """Static dispatch predicate (shape = [..., C]).

    Default OFF (opt-in via XFM_FUSED_LN=1): measured END-TO-END on the
    327M pretrain step (v5e chip, B=48, bf16), the Pallas kernel loses to
    XLA's own fusions despite the lower theoretical HBM traffic —
    248.4 samples/s (XLA) vs 232.2 (kernel at the residual add+LN sites
    only) vs 227.2 (kernel at every LN site). A pallas_call is an XLA
    fusion *boundary*: the dropout/bias-add/DropPath producers and the
    stats consumers that XLA previously folded into neighboring fusions
    must now materialize their operands to HBM, which costs more than the
    one pass saved inside the kernel. Kept for N-large/width-odd regimes
    and as the measurement harness for future epilogue-fusion work.
    """
    if os.environ.get("XFM_FUSED_LN", "0") != "1":
        return False
    if not (_HAS_PALLAS and _on_tpu()):
        return False
    C = shape[-1]
    if C % 128 or C > 8192:
        return False
    return dtype in (jnp.bfloat16, jnp.float32)


# ---------------------------------------------------------------------------
# kernels ([R, C] row blocks; stats are per-row lane reductions)
# ---------------------------------------------------------------------------


def _fwd_kernel(eps, has_y, refs):
    if has_y:
        x_ref, y_ref, g_ref, b_ref, xn_ref, h_ref = refs
    else:
        x_ref, g_ref, b_ref, h_ref = refs
    x = x_ref[...].astype(jnp.float32)
    xn = x + y_ref[...].astype(jnp.float32) if has_y else x
    mu = jnp.mean(xn, axis=-1, keepdims=True)
    d = xn - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    h = (d * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32))
    if has_y:
        xn_ref[...] = xn.astype(xn_ref.dtype)
    h_ref[...] = h.astype(h_ref.dtype)


def _bwd_kernel(eps, has_dxn, nrows, rb, refs):
    if has_dxn:
        xn_ref, dh_ref, dxn_ref, g_ref, dx_ref, dg_ref, db_ref = refs
    else:
        xn_ref, dh_ref, g_ref, dx_ref, dg_ref, db_ref = refs
    i = pl.program_id(0)
    # zero the partial tail block so garbage rows can't poison the
    # per-channel accumulators or produce inf*0 NaNs
    row = i * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    valid = row < nrows
    xn = jnp.where(valid, xn_ref[...].astype(jnp.float32), 0.0)
    dh = jnp.where(valid, dh_ref[...].astype(jnp.float32), 0.0)
    mu = jnp.mean(xn, axis=-1, keepdims=True)
    d = xn - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = d * rstd
    g = dh * g_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    total = rstd * (g - m1 - xhat * m2)
    if has_dxn:
        total = total + jnp.where(
            valid, dxn_ref[...].astype(jnp.float32), 0.0)
    dx_ref[...] = total.astype(dx_ref.dtype)
    pg = jnp.sum(dh * xhat, axis=0, keepdims=True)
    pb = jnp.sum(dh, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = pg
        db_ref[...] = pb

    @pl.when(i > 0)
    def _():
        dg_ref[...] += pg
        db_ref[...] += pb


def _row_specs(rb, C, n):
    return [pl.BlockSpec((rb, C), lambda i: (i, 0)) for _ in range(n)]


def _vec_spec(C):
    return pl.BlockSpec((1, C), lambda i: (0, 0))


def _fwd_pallas(x2, y2, gamma, beta, eps, interpret):
    R, C = x2.shape
    rb = min(_ROWS_PER_BLOCK, max(8, R))
    grid = (pl.cdiv(R, rb),)
    has_y = y2 is not None
    g2 = gamma.reshape(1, C)
    b2 = beta.reshape(1, C)
    in_specs = (_row_specs(rb, C, 2 if has_y else 1)
                + [_vec_spec(C), _vec_spec(C)])
    out_shapes = [jax.ShapeDtypeStruct((R, C), x2.dtype)] * (
        2 if has_y else 1)
    out_specs = _row_specs(rb, C, 2 if has_y else 1)
    args = (x2, y2, g2, b2) if has_y else (x2, g2, b2)
    kernel = lambda *refs: _fwd_kernel(eps, has_y, refs)
    out = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                         out_specs=out_specs,
                         out_shape=out_shapes, interpret=interpret)(*args)
    return (out[0], out[1]) if has_y else (x2, out[0])


def _bwd_pallas(xn2, dh2, dxn2, gamma, eps, interpret):
    R, C = xn2.shape
    rb = min(_ROWS_PER_BLOCK, max(8, R))
    grid = (pl.cdiv(R, rb),)
    has_dxn = dxn2 is not None
    in_specs = (_row_specs(rb, C, 3 if has_dxn else 2) + [_vec_spec(C)])
    out_shapes = [jax.ShapeDtypeStruct((R, C), xn2.dtype),
                  jax.ShapeDtypeStruct((1, C), jnp.float32),
                  jax.ShapeDtypeStruct((1, C), jnp.float32)]
    out_specs = _row_specs(rb, C, 1) + [_vec_spec(C), _vec_spec(C)]
    args = ((xn2, dh2, dxn2) if has_dxn else (xn2, dh2)) + (
        gamma.reshape(1, C),)
    kernel = lambda *refs: _bwd_kernel(eps, has_dxn, R, rb, refs)
    dx, dg, db = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                                out_specs=out_specs, out_shape=out_shapes,
                                interpret=interpret)(*args)
    return dx, dg.reshape(C), db.reshape(C)


# ---------------------------------------------------------------------------
# jnp fallback (identical math; also the CPU-test oracle)
# ---------------------------------------------------------------------------


def _fwd_reference(x, y, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    xn = xf + y.astype(jnp.float32) if y is not None else xf
    mu = jnp.mean(xn, axis=-1, keepdims=True)
    d = xn - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    h = (d * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32))
    xn_out = xn.astype(x.dtype) if y is not None else x
    return xn_out, h.astype(x.dtype)


# ---------------------------------------------------------------------------
# public entries (custom_vjp; the residual-branch gradient ALIASES dx).
# Three variants so no caller ever pays for a cotangent it doesn't have:
#   fused_ln(x)          → h            (plain LN)
#   fused_ln_post(x, y)  → h            (post-LN BERT: sum not re-used)
#   fused_add_ln(x, y)   → (x + y, h)   (pre-LN: sum carries the residual)
# ---------------------------------------------------------------------------


def _fwd_impl(x, y, gamma, beta, eps, interpret):
    leading = x.shape[:-1]
    C = x.shape[-1]
    if fused_ln_ok(x.shape, x.dtype) or interpret:
        x2 = x.reshape(-1, C)
        y2 = y.reshape(-1, C) if y is not None else None
        xn2, h2 = _fwd_pallas(x2, y2, gamma, beta, eps, interpret)
        return xn2.reshape(*leading, C), h2.reshape(*leading, C)
    return _fwd_reference(x, y, gamma, beta, eps)


def _bwd_impl(xn, dh, dxn_direct, gamma, eps, interpret):
    """Shared LN backward: → (dx_total, dgamma, dbeta)."""
    leading = xn.shape[:-1]
    C = xn.shape[-1]
    if fused_ln_ok(xn.shape, xn.dtype) or interpret:
        dx2, dg, db = _bwd_pallas(xn.reshape(-1, C), dh.reshape(-1, C),
                                  None if dxn_direct is None
                                  else dxn_direct.reshape(-1, C),
                                  gamma, eps, interpret)
        dx = dx2.reshape(*leading, C)
    else:
        xf = xn.astype(jnp.float32)
        dhf = dh.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        d = xf - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = d * rstd
        g = dhf * gamma.astype(jnp.float32)
        m1 = jnp.mean(g, axis=-1, keepdims=True)
        m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
        total = rstd * (g - m1 - xhat * m2)
        if dxn_direct is not None:
            total = total + dxn_direct.astype(jnp.float32)
        dx = total.astype(xn.dtype)
        axes = tuple(range(xn.ndim - 1))
        dg = jnp.sum(dhf * xhat, axis=axes)
        db = jnp.sum(dhf, axis=axes)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ln(x, gamma, beta, eps: float = 1e-6, interpret: bool = False):
    """Plain LayerNorm, one fused pass (1 read + 1 write on TPU)."""
    return _fwd_impl(x, None, gamma, beta, eps, interpret)[1]


def _fused_ln_fwd(x, gamma, beta, eps, interpret):
    return fused_ln(x, gamma, beta, eps, interpret), (x, gamma)


def _fused_ln_bwd(eps, interpret, res, dh):
    x, gamma = res
    dx, dg, db = _bwd_impl(x, dh, None, gamma, eps, interpret)
    return dx, dg, db


fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ln_post(x, y, gamma, beta, eps: float = 1e-6,
                  interpret: bool = False):
    """LN(x + y) * gamma + beta — the post-LN BERT residual site."""
    return _fwd_impl(x, y, gamma, beta, eps, interpret)[1]


def _fused_ln_post_fwd(x, y, gamma, beta, eps, interpret):
    xn, h = _fwd_impl(x, y, gamma, beta, eps, interpret)
    return h, (xn, gamma)


def _fused_ln_post_bwd(eps, interpret, res, dh):
    xn, gamma = res
    dx, dg, db = _bwd_impl(xn, dh, None, gamma, eps, interpret)
    return dx, dx, dg, db


fused_ln_post.defvjp(_fused_ln_post_fwd, _fused_ln_post_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_add_ln(x, y, gamma, beta, eps: float = 1e-6,
                 interpret: bool = False):
    """→ (x + y, LN(x + y) * gamma + beta) — the pre-LN residual site.

    Inputs [..., C]; stats in f32; outputs in x.dtype. On TPU this is one
    Pallas pass over the rows (2 reads / 2 writes vs XLA's 4 + 2);
    elsewhere (or when `fused_ln_ok` declines) an identical-math jnp
    composition.
    """
    return _fwd_impl(x, y, gamma, beta, eps, interpret)


def _fused_add_ln_fwd(x, y, gamma, beta, eps, interpret):
    xn, h = _fwd_impl(x, y, gamma, beta, eps, interpret)
    return (xn, h), (xn, gamma)


def _fused_add_ln_bwd(eps, interpret, res, cts):
    xn, gamma = res
    dxn_direct, dh = cts
    dx, dg, db = _bwd_impl(xn, dh, dxn_direct, gamma, eps, interpret)
    return dx, dx, dg, db


fused_add_ln.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


# ---------------------------------------------------------------------------
# flax module — drop-in param-compatible with nn.LayerNorm ("scale"/"bias")
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm twin (same param names/shapes/init, so checkpoints and
    importers are unaffected) that also takes an optional residual:

        h          = FusedLayerNorm(...)(x)                 # plain LN
        xn, h      = FusedLayerNorm(...)(y, residual=x, return_sum=True)
        h          = FusedLayerNorm(...)(y, residual=x)     # post-LN BERT
    """
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual: Optional[jax.Array] = None,
                 return_sum: bool = False):
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,))
        beta = self.param("bias", nn.initializers.zeros, (C,))
        x = x.astype(self.dtype)
        if residual is None:
            return fused_ln(x, gamma, beta, self.epsilon)
        residual = residual.astype(self.dtype)
        if return_sum:
            return fused_add_ln(x, residual, gamma, beta, self.epsilon)
        return fused_ln_post(x, residual, gamma, beta, self.epsilon)
