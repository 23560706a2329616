"""Fused activation-prologue matmul for the MLP second projection.

XLA lowers the transformer MLP tail `a = act(h); y = a @ W2 + b` as a
standalone elementwise fusion producing `a` in HBM plus a matmul reading it
back — at the XFM-base pretrain shape the [2B, N, 3072] activation tensor
is ~116 MB bf16 per vision layer, so `a` costs a write (fwd fusion), a read
(fwd matmul), and a bwd read (dW = aᵀg) of HBM traffic per layer
(profiled ~13 ms/step of gelu fusions, PERF.md). These kernels compute
`act(h)` as a VMEM prologue *inside* each matmul so `a` never exists in
HBM:

  fwd : y  = act(h) @ W + b          (grid over M rows, W resident)
  bwd : dW = act(h)ᵀ @ g             (accumulated f32 across the M grid)
        dh = (g @ Wᵀ) ⊙ act'(h)      (epilogue multiply, h re-read once)
        db = Σ_M g                   (left to XLA — trivial)

Net per layer: the fwd write + fwd read + bwd read of `a` disappear; the
bwd recomputes act(h) once more in-VMEM (VPU work hidden under the MXU
matmul). Opt-in via XFM_MLP_FUSED=1 (`ActDense` module, param-compatible
with nn.Dense); parity pinned by tests/test_fused_mlp.py. The reference
has no counterpart (torch fuses nothing here; reference models/beit2.py
Mlp / models/xbert.py BertIntermediate+BertOutput).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _act_fns(act: str):
    """(act, act') as f32 elementwise fns matching the model's ACT table."""
    if act == "gelu_tanh":
        c = 0.7978845608028654  # sqrt(2/pi)

        def f(x):
            return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))

        def df(x):
            t = jnp.tanh(c * (x + 0.044715 * x ** 3))
            dt = (1.0 - t * t) * c * (1.0 + 3 * 0.044715 * x * x)
            return 0.5 * (1.0 + t) + 0.5 * x * dt

        return f, df
    if act == "gelu":
        # Mosaic has no `erf` primitive — use the repo's own bf16-exact
        # tanh-form Phi (ops/activations.py, fit by fit_gelu_poly.py),
        # which is also what ACT['gelu'] computes on the XLA path.
        from .activations import _INV_SQRT_2PI, _phi_hat

        def f(x):
            return x * _phi_hat(jnp.clip(x, -6.0, 6.0))

        def df(x):
            xc = jnp.clip(x, -6.0, 6.0)
            phi = _phi_hat(xc)
            pdf = jnp.exp(-0.5 * xc * xc) * jnp.float32(_INV_SQRT_2PI)
            d = phi + x * pdf
            return jnp.where(x >= 6.0, 1.0, jnp.where(x <= -6.0, 0.0, d))

        return f, df
    if act == "relu":
        return (lambda x: jnp.maximum(x, 0.0),
                lambda x: (x > 0).astype(x.dtype))
    raise NotImplementedError(f"fused MLP does not support act={act!r}")


def _fwd_kernel(h_ref, w_ref, b_ref, o_ref, *, act):
    f, _ = _act_fns(act)
    h = h_ref[...]
    a = f(h.astype(jnp.float32)).astype(h.dtype)
    y = jax.lax.dot_general(a, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _dw_kernel(h_ref, g_ref, dw_ref, *, act):
    f, _ = _act_fns(act)
    h = h_ref[...]
    a = f(h.astype(jnp.float32)).astype(h.dtype)
    dw = jax.lax.dot_general(a, g_ref[...].astype(a.dtype),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    dw_ref[...] += dw


def _dh_kernel(g_ref, w_ref, h_ref, dh_ref, *, act):
    _, df = _act_fns(act)
    da = jax.lax.dot_general(g_ref[...], w_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * df(h_ref[...].astype(jnp.float32))
    dh_ref[...] = dh.astype(dh_ref.dtype)


def _pick_bm(M: int) -> int:
    bm = int(os.environ.get("XFM_MLP_BM", "256"))
    return min(_round_up(M, 16), bm)


def _pad_rows(x, Mp):
    return jnp.pad(x, ((0, Mp - x.shape[0]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def act_matmul(h, w, b, act="gelu_tanh", interpret=False):
    """y = act(h) @ w + b with the activation fused into the matmuls.

    h: [M, K]; w: [K, N]; b: [N]. Differentiable in h, w, b.
    """
    return _act_matmul_fwd_impl(h, w, b, act, interpret)


def _act_matmul_fwd_impl(h, w, b, act, interpret):
    M, K = h.shape
    N = w.shape[1]
    bm = _pick_bm(M)
    Mp = _round_up(M, bm)
    hp = _pad_rows(h, Mp)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, act=act),
        grid=(Mp // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0)),
                  pl.BlockSpec((1, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), h.dtype),
        interpret=interpret,
    )(hp, w, b.reshape(1, N))
    return out[:M]


def _act_matmul_fwd(h, w, b, act, interpret):
    return _act_matmul_fwd_impl(h, w, b, act, interpret), (h, w)


def _act_matmul_bwd(act, interpret, res, g):
    h, w = res
    M, K = h.shape
    N = w.shape[1]
    bm = _pick_bm(M)
    Mp = _round_up(M, bm)
    hp = _pad_rows(h, Mp)
    gp = _pad_rows(g, Mp)

    dw = pl.pallas_call(
        functools.partial(_dw_kernel, act=act),
        grid=(Mp // bm,),
        in_specs=[pl.BlockSpec((bm, K), lambda i: (i, 0)),
                  pl.BlockSpec((bm, N), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((K, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        interpret=interpret,
    )(hp, gp).astype(w.dtype)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, act=act),
        grid=(Mp // bm,),
        in_specs=[pl.BlockSpec((bm, N), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0)),
                  pl.BlockSpec((bm, K), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, K), h.dtype),
        interpret=interpret,
    )(gp, w, hp)[:M]

    db = jnp.sum(g.astype(jnp.float32), axis=0).astype(h.dtype)
    return dh, dw, db


act_matmul.defvjp(_act_matmul_fwd, _act_matmul_bwd)


@functools.lru_cache(maxsize=1)
def fused_mlp_ok() -> bool:
    if os.environ.get("XFM_MLP_FUSED", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def act_dense(x, kernel, bias, act: str, interpret=False):
    """[..., K] → [..., N] fused act+matmul, any leading dims."""
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    y = act_matmul(x.reshape(M, x.shape[-1]), kernel, bias, act, interpret)
    return y.reshape(*lead, kernel.shape[1])
