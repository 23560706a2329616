"""Real-chip parity tests for the Pallas kernels.

The CPU suite checks these kernels in interpret mode; here the compiled
Mosaic lowering runs on the actual MXU/VPU. Tolerances are bf16-scale:
the XLA reference path also computes in bf16 on the chip.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _mae(a, b):
    return float(jnp.mean(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))


@pytest.mark.parametrize("B,N,H,D", [(4, 197, 12, 64)])
def test_packed_attention_fwd_bwd_parity(tpu, B, N, H, D):
    """Packed-qkv kernel vs the XLA path, fwd + full backward (dqkv, dbias),
    on the rel-pos-bias self-attention shape it dispatches for."""
    from xfm_tpu.ops.attention import dot_product_attention
    from xfm_tpu.ops.flash_attention import flash_attention_packed, packed_ok

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qkv = jax.random.normal(k1, (B, N, 3 * H * D), jnp.bfloat16) * 0.5
    bias = jax.random.normal(k2, (1, H, N, N), jnp.float32) * 0.1
    assert packed_ok(qkv.shape, H, bias, qkv.dtype), \
        "kernel must dispatch for this shape on TPU"
    scale = D ** -0.5

    def xla_path(qkv, bias):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = dot_product_attention(
            q.reshape(B, N, H, D), k.reshape(B, N, H, D),
            v.reshape(B, N, H, D), bias=bias, use_flash=False)
        return out.reshape(B, N, H * D)

    def loss_kernel(qkv, bias):
        return jnp.sum(flash_attention_packed(qkv, bias, scale, H) ** 2)

    def loss_xla(qkv, bias):
        return jnp.sum(xla_path(qkv, bias) ** 2)

    out_k = jax.jit(lambda a, b: flash_attention_packed(a, b, scale, H))(
        qkv, bias)
    out_x = jax.jit(xla_path)(qkv, bias)
    assert _mae(out_k, out_x) < 5e-3

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1)))(qkv, bias)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(qkv, bias)
    assert _mae(gk[0], gx[0]) < 5e-2          # dqkv (bf16 grads, N=197 sums)
    rel = (jnp.abs(gk[1] - gx[1]).mean()
           / (jnp.abs(gx[1]).mean() + 1e-8))
    assert float(rel) < 5e-2                   # dbias


def test_fused_ln_parity(tpu):
    """Opt-in fused add+LN kernel vs the jnp reference on chip, fwd+bwd."""
    from xfm_tpu.ops.fused_ln import _fwd_reference, fused_add_ln

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (96, 197, 768), jnp.bfloat16)
    y = jax.random.normal(k2, (96, 197, 768), jnp.bfloat16)
    gamma = jnp.ones((768,), jnp.float32)
    beta = jnp.zeros((768,), jnp.float32)

    def ref(x, y):
        h, _ = _fwd_reference(x, y, gamma, beta, 1e-6)
        return h

    def kern(x, y):
        h, _ = fused_add_ln(x, y, gamma, beta)
        return h

    hk = jax.jit(kern)(x, y)
    hr = jax.jit(ref)(x, y)
    assert _mae(hk, hr) < 2e-2

    gk = jax.jit(jax.grad(lambda x, y: jnp.sum(kern(x, y) ** 2),
                          argnums=(0, 1)))(x, y)
    gr = jax.jit(jax.grad(lambda x, y: jnp.sum(ref(x, y) ** 2),
                          argnums=(0, 1)))(x, y)
    assert _mae(gk[0], gr[0]) < 5e-2
    assert _mae(gk[1], gr[1]) < 5e-2


def test_fast_erf_gelu_on_chip(tpu):
    """gelu_erf_fast must stay bf16-ulp-exact vs the exact erf GELU on the
    real VPU (the CPU test pins the same property against the polynomial's
    float32 evaluation)."""
    from xfm_tpu.ops.activations import gelu_erf, gelu_erf_fast

    x = jnp.linspace(-6.0, 6.0, 8192, dtype=jnp.float32).astype(jnp.bfloat16)
    exact = jax.jit(gelu_erf)(x)
    fast = jax.jit(gelu_erf_fast)(x)
    # identical bf16 bit patterns except possibly sub-ulp ties
    diff = jnp.abs(exact.astype(jnp.float32) - fast.astype(jnp.float32))
    ulp = jnp.maximum(jnp.abs(exact.astype(jnp.float32)) * 2 ** -8, 2 ** -14)
    assert float(jnp.max(diff / ulp)) <= 1.0 + 1e-6


@pytest.mark.parametrize("bias_kind", [None, "relpos"])
def test_loopq_backward_parity_long_seq(tpu, bias_kind):
    """Loop-over-q backward (the N>~500 fine-tune path: in-kernel q-block
    fori_loop, VMEM dk/dv accumulation) vs the XLA path on the compiled
    Mosaic lowering, at a 577-token 384px-like shape."""
    from xfm_tpu.ops.attention import dot_product_attention
    from xfm_tpu.ops.flash_attention import flash_attention

    B, N, H, D = 2, 577, 12, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16) * 0.5
    bias = None
    if bias_kind == "relpos":
        bias = jax.random.normal(ks[3], (1, H, N, N), jnp.float32) * 0.1
    scale = D ** -0.5

    def loss_kernel(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, scale) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(dot_product_attention(q, k, v, bias=bias,
                                             use_flash=False) ** 2)

    argnums = (0, 1, 2) + ((3,) if bias is not None else ())
    gk = jax.jit(jax.grad(loss_kernel, argnums=argnums))(q, k, v, bias)
    gx = jax.jit(jax.grad(loss_xla, argnums=argnums))(q, k, v, bias)
    for a, b in zip(gk, gx):
        rel = (jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()
               / (jnp.abs(b.astype(jnp.float32)).mean() + 1e-8))
        assert float(rel) < 5e-2, bias_kind


def test_fused_mlp_parity_on_chip(tpu):
    """act-prologue matmul trio (ops/fused_mlp.py) vs the XLA composition
    on the chip, MLP-tail shape."""
    from xfm_tpu.models.text_encoder import ACT
    from xfm_tpu.ops.fused_mlp import act_matmul

    M, K, N = 1576, 3072, 768
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    h = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
    w = jax.random.normal(ks[1], (K, N), jnp.bfloat16) * 0.05
    b = jax.random.normal(ks[2], (N,), jnp.bfloat16) * 0.1
    g = jax.random.normal(ks[3], (M, N), jnp.bfloat16)

    def ref(h, w, b):
        return jnp.sum(g * (ACT["gelu_tanh"](h) @ w + b))

    def fused(h, w, b):
        return jnp.sum(g * act_matmul(h, w, b, "gelu_tanh"))

    yk = jax.jit(lambda h, w, b: act_matmul(h, w, b, "gelu_tanh"))(h, w, b)
    yx = jax.jit(lambda h, w, b: ACT["gelu_tanh"](h) @ w + b)(h, w, b)
    assert _mae(yk, yx) < 5e-2
    gk = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(h, w, b)
    gx = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(h, w, b)
    for a, x in zip(gk, gx):
        rel = (jnp.abs(a.astype(jnp.float32) - x.astype(jnp.float32)).mean()
               / (jnp.abs(x.astype(jnp.float32)).mean() + 1e-8))
        assert float(rel) < 5e-2


@pytest.mark.parametrize("window", [(24, 24), (30, 30)])
def test_relpos_inkernel_parity_on_chip(tpu, window):
    """In-kernel rel-pos expansion (compact block-Toeplitz form, round 5)
    vs the materialized-bias XLA path on the compiled Mosaic lowering, at
    the real 384px (N=577) and 480px (N=901) windows — fwd + full backward
    incl. the table gradient folded back compact in VMEM."""
    from xfm_tpu.ops.attention import dot_product_attention
    from xfm_tpu.ops.flash_attention import beit_attention_relpos
    from xfm_tpu.ops.relpos import beit_rel_pos_bias

    wh, ww = window
    B, H, D = 2, 12, 64
    N = wh * ww + 1
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16) * 0.5
    table = jax.random.normal(
        ks[3], ((2 * wh - 1) * (2 * ww - 1) + 3, H), jnp.float32) * 0.1
    scale = D ** -0.5

    def loss_kernel(q, k, v, t):
        out = beit_attention_relpos(q, k, v, t, window, scale,
                                    bias_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v, t):
        bias = beit_rel_pos_bias(t, window, jnp.bfloat16)
        out = dot_product_attention(q, k, v, bias=bias, use_flash=False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    out_k = jax.jit(lambda *a: beit_attention_relpos(
        *a, window, scale, bias_dtype=jnp.bfloat16))(q, k, v, table)
    out_x = jax.jit(lambda q, k, v, t: dot_product_attention(
        q, k, v, bias=beit_rel_pos_bias(t, window, jnp.bfloat16),
        use_flash=False))(q, k, v, table)
    assert _mae(out_k, out_x) < 5e-3

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2, 3)))(q, k, v,
                                                              table)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))(q, k, v, table)
    for a, b, name in zip(gk, gx, ("dq", "dk", "dv", "dtable")):
        rel = (jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()
               / (jnp.abs(b.astype(jnp.float32)).mean() + 1e-8))
        assert float(rel) < 5e-2, (name, float(rel))
