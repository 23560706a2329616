"""Pallas fused-attention kernel vs XLA reference (SURVEY.md §4.4), run in
interpreter mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xfm_tpu.ops.attention import mask_to_bias
from xfm_tpu.ops.flash_attention import (_xla_reference,
                                         _fused_attention_fwd_impl,
                                         flash_attention)


def rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("B,Nq,Nk,H,D", [
    (2, 30, 30, 4, 16),      # text-sized, unaligned
    (1, 197, 197, 3, 64),    # ViT 224/16 + cls
    (2, 16, 128, 2, 32),     # cross-attention, q != k
])
def test_fused_matches_xla_nobias(B, Nq, Nk, H, D):
    q = rand((B, Nq, H, D), 0)
    k = rand((B, Nk, H, D), 1)
    v = rand((B, Nk, H, D), 2)
    scale = D ** -0.5
    ref = _xla_reference(q, k, v, None, scale)
    out = _fused_attention_fwd_impl(q, k, v, None, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_fused_with_relpos_bias():
    B, N, H, D = 2, 17, 4, 16
    q, k, v = rand((B, N, H, D), 0), rand((B, N, H, D), 1), rand((B, N, H, D), 2)
    bias = rand((1, H, N, N), 3)  # rel-pos-bias shape
    scale = D ** -0.5
    ref = _xla_reference(q, k, v, bias, scale)
    out = _fused_attention_fwd_impl(q, k, v, bias, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_fused_with_padding_mask():
    B, N, H, D = 2, 12, 2, 8
    q, k, v = rand((B, N, H, D), 0), rand((B, N, H, D), 1), rand((B, N, H, D), 2)
    mask = jnp.ones((B, N), jnp.int32).at[:, 8:].set(0)
    bias = mask_to_bias(mask)  # [B,1,1,N]
    scale = D ** -0.5
    ref = _xla_reference(q, k, v, bias, scale)
    out = _fused_attention_fwd_impl(q, k, v, bias, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_fused_backward_matches_xla():
    B, N, H, D = 1, 20, 2, 16
    q, k, v = rand((B, N, H, D), 0), rand((B, N, H, D), 1), rand((B, N, H, D), 2)
    bias = rand((1, H, N, N), 3)
    scale = D ** -0.5

    def f_ref(q, k, v, b):
        return jnp.sum(_xla_reference(q, k, v, b, scale) ** 2)

    def f_fused(q, k, v, b):
        return jnp.sum(flash_attention(q, k, v, b, scale, True) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3,
                                   rtol=1e-2)


def test_fused_backward_mask_bias():
    """Backward through a broadcast [B,1,1,Nk] mask bias (cross-attn case)."""
    B, Nq, Nk, H, D = 2, 12, 20, 2, 8
    q, k, v = rand((B, Nq, H, D), 0), rand((B, Nk, H, D), 1), rand((B, Nk, H, D), 2)
    mask = jnp.ones((B, Nk), jnp.int32).at[:, 15:].set(0)
    bias = mask_to_bias(mask)
    scale = D ** -0.5

    def f_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, bias, scale) ** 2)

    def f_fused(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, scale, True) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_fus = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3,
                                   rtol=1e-2)


@pytest.mark.parametrize("bias_shape", [None, "relpos", "mask"])
def test_fused_backward_matches_xla(bias_shape):
    B, N, H, D = 2, 21, 3, 16
    q = rand((B, N, H, D), 0)
    k = rand((B, N, H, D), 1)
    v = rand((B, N, H, D), 2)
    bias = None
    if bias_shape == "relpos":
        bias = rand((1, H, N, N), 3)
    elif bias_shape == "mask":
        bias = rand((B, 1, 1, N), 3)
    scale = D ** -0.5

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, scale, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_xla_reference(q, k, v, bias, scale) ** 2)

    args = (q, k, v) + ((bias,) if bias is not None else (None,))
    gf = jax.grad(loss_flash, argnums=(0, 1, 2) + ((3,) if bias is not None
                                                   else ()))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2) + ((3,) if bias is not None
                                                 else ()))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-2)


def test_packed_matches_xla_fwd_bwd():
    from xfm_tpu.ops.flash_attention import (_packed_fwd_impl,
                                             _packed_bwd_impl)

    B, N, H, D = 2, 21, 4, 16  # hpb = 8 heads/window? 128//16=8>H → hpb caps
    # use D=32, H=4 → hpb=4, C=128 (one lane window)
    B, N, H, D = 2, 21, 4, 32
    C = H * D
    qkv = rand((B, N, 3 * C), 0)
    bias = rand((1, H, N, N), 3)
    scale = D ** -0.5

    q, k, v = [t.reshape(B, N, H, D) for t in jnp.split(qkv, 3, axis=-1)]
    ref = _xla_reference(q, k, v, bias, scale).reshape(B, N, C)
    out = _packed_fwd_impl(qkv, bias, scale, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)

    g = rand((B, N, C), 7)

    def loss_ref(qkv, bias):
        q, k, v = [t.reshape(B, N, H, D)
                   for t in jnp.split(qkv, 3, axis=-1)]
        o = _xla_reference(q, k, v, bias, scale).reshape(B, N, C)
        return jnp.sum(o * g)

    dq_ref, db_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    dqkv, db = _packed_bwd_impl(qkv, bias, scale, H, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dq_ref),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_packed_batch_blocked_matches_xla():
    """G>1 path: several batch rows per grid cell."""
    from xfm_tpu.ops.flash_attention import (_packed_fwd_impl,
                                             _packed_bwd_impl, _pick_g)

    B, N, H, D = 8, 21, 4, 32
    C = H * D
    qkv = rand((B, N, 3 * C), 0)
    bias = rand((1, H, N, N), 3)
    scale = D ** -0.5
    assert _pick_g(B, 128) == 8

    q, k, v = [t.reshape(B, N, H, D) for t in jnp.split(qkv, 3, axis=-1)]
    ref = _xla_reference(q, k, v, bias, scale).reshape(B, N, C)
    out = _packed_fwd_impl(qkv, bias, scale, H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)

    g = rand((B, N, C), 7)

    def loss_ref(qkv, bias):
        q, k, v = [t.reshape(B, N, H, D)
                   for t in jnp.split(qkv, 3, axis=-1)]
        o = _xla_reference(q, k, v, bias, scale).reshape(B, N, C)
        return jnp.sum(o * g)

    dq_ref, db_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    dqkv, db = _packed_bwd_impl(qkv, bias, scale, H, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dq_ref),
                               atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.parametrize("scheme", ["loopq", "partials"])
@pytest.mark.parametrize("bias_shape", [None, "relpos", "mask"])
def test_blocked_q_backward_long_sequence(bias_shape, scheme, monkeypatch):
    """N past ~600 splits the backward's q dimension into blocks (scoped
    VMEM) — the 384/480px fine-tune regime. Default scheme: loop-over-q
    kernel (dk/dv accumulated in VMEM, written once); XFM_BWD_PARTIALS=1
    is the legacy per-block HBM-partials scheme. Parity vs XLA for both,
    with the loop path forced to multiple blocks (XFM_BWD_QBLK)."""
    from xfm_tpu.ops.flash_attention import _pick_bwd_blk_q

    B, N, H, D = 1, 600, 2, 16
    assert _pick_bwd_blk_q(N, 640, 8) < 600  # the blocked path engages
    if scheme == "partials":
        monkeypatch.setenv("XFM_BWD_PARTIALS", "1")
    else:
        monkeypatch.setenv("XFM_BWD_QBLK", "200")  # 3 in-kernel q-blocks
    q = rand((B, N, H, D), 0)
    k = rand((B, N, H, D), 1)
    v = rand((B, N, H, D), 2)
    bias = None
    if bias_shape == "relpos":
        bias = rand((1, H, N, N), 3) * 0.1
    elif bias_shape == "mask":
        bias = mask_to_bias(jnp.ones((B, N), jnp.int32).at[:, 580:].set(0))
    scale = D ** -0.5

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, scale, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_xla_reference(q, k, v, bias, scale) ** 2)

    argnums = (0, 1, 2) + ((3,) if bias is not None else ())
    gf = jax.grad(loss_flash, argnums=argnums)(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-2)


def test_loopq_backward_bh_bias(monkeypatch):
    """Full per-(batch, head) bias with a blocked q dim — unsupported by the
    legacy partials scheme (db would need non-contiguous accumulation), now
    handled by the loop-over-q kernel (each cell owns its db block)."""
    monkeypatch.setenv("XFM_BWD_QBLK", "200")
    B, N, H, D = 2, 600, 2, 16
    q = rand((B, N, H, D), 0)
    k = rand((B, N, H, D), 1)
    v = rand((B, N, H, D), 2)
    bias = rand((B, H, 1, N), 3) * 0.1
    scale = D ** -0.5

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, scale, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_xla_reference(q, k, v, bias, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3,
                                   rtol=1e-2)


def test_fwd_blk_q_minimizes_padding():
    from xfm_tpu.ops.flash_attention import _pick_blk_q

    assert _pick_blk_q(197, 16) == 208     # single block, sublane-rounded
    assert _pick_blk_q(577, 16) == 304     # 2 blocks of 304, not 2x512
    assert _pick_blk_q(901, 16) == 464     # 2 blocks
    assert _pick_blk_q(512, 16) == 512


@pytest.mark.parametrize("window,B,H,D", [
    ((4, 4), 2, 2, 8),    # N=17, single fwd q-block
    ((6, 6), 1, 4, 16),   # N=37
])
def test_relpos_inkernel_matches_xla(window, B, H, D):
    """In-kernel rel-pos expansion (compact block-Toeplitz form) vs the
    XLA reference with the materialized beit_rel_pos_bias — forward and
    all gradients incl. the table's."""
    from xfm_tpu.ops.flash_attention import beit_attention_relpos
    from xfm_tpu.ops.relpos import beit_rel_pos_bias

    wh, ww = window
    N = wh * ww + 1
    q, k, v = rand((B, N, H, D), 0), rand((B, N, H, D), 1), \
        rand((B, N, H, D), 2)
    table = rand(((2 * wh - 1) * (2 * ww - 1) + 3, H), 3)
    scale = D ** -0.5

    def f_ref(q, k, v, t):
        bias = beit_rel_pos_bias(t, window)
        return jnp.sum(_xla_reference(q, k, v, bias, scale) ** 2)

    def f_kern(q, k, v, t):
        out = beit_attention_relpos(q, k, v, t, window, scale,
                                    interpret=True)
        return jnp.sum(out ** 2)

    ref = _xla_reference(q, k, v, beit_rel_pos_bias(table, window), scale)
    out = beit_attention_relpos(q, k, v, table, window, scale,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_got = jax.grad(f_kern, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3,
                                   rtol=1e-2)


def test_relpos_inkernel_blocked_fwd(monkeypatch):
    """Forward q-blocking reads row slices of the VMEM bias scratch built
    once per head."""
    from xfm_tpu.ops.flash_attention import beit_attention_relpos
    from xfm_tpu.ops.relpos import beit_rel_pos_bias

    monkeypatch.setenv("XFM_FWD_QBLK_CAP", "16")  # 37 rows -> 3 blocks
    window = (6, 6)
    B, H, D = 2, 2, 8
    N = 37
    q, k, v = rand((B, N, H, D), 4), rand((B, N, H, D), 5), \
        rand((B, N, H, D), 6)
    table = rand(((2 * 6 - 1) ** 2 + 3, H), 7)
    scale = D ** -0.5
    ref = _xla_reference(q, k, v, beit_rel_pos_bias(table, window), scale)
    out = beit_attention_relpos(q, k, v, table, window, scale,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_relpos_inkernel_bf16_bias_matches_bf16_materialized():
    """bias_dtype=bf16 must equal the materialized-bf16-bias kernel path
    numerics (the compact form holds the same rounded values)."""
    from xfm_tpu.ops.flash_attention import beit_attention_relpos
    from xfm_tpu.ops.relpos import beit_rel_pos_bias

    window = (4, 4)
    B, H, D = 1, 2, 8
    N = 17
    q, k, v = rand((B, N, H, D), 8), rand((B, N, H, D), 9), \
        rand((B, N, H, D), 10)
    table = rand(((2 * 4 - 1) ** 2 + 3, H), 11)
    scale = D ** -0.5
    bias = beit_rel_pos_bias(table, window, jnp.bfloat16)
    ref = _xla_reference(q, k, v, bias, scale)
    out = beit_attention_relpos(q, k, v, table, window, scale,
                                bias_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)
