"""ops/relpos.py: the one-hot-matmul rel-pos bias must be bit-exact with
the reference's table gather (reference models/beit2.py:99-116, reference
models/swin_transformer.py window bias)."""
import jax.numpy as jnp
import numpy as np
import pytest

from xfm_tpu.models.beit2 import relative_position_index
from xfm_tpu.models.swin import swin_rel_pos_index
from xfm_tpu.ops.relpos import beit_rel_pos_bias, rel_pos_bias_2d


@pytest.mark.parametrize("window", [(14, 14), (3, 5), (1, 4)])
def test_beit_bias_matches_gather(window):
    wh, ww = window
    n = wh * ww + 1
    h = 4
    rng = np.random.default_rng(0)
    table = rng.standard_normal(((2 * wh - 1) * (2 * ww - 1) + 3, h),
                                dtype=np.float32)
    idx = relative_position_index(window)
    ref = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)[None]
    got = np.asarray(beit_rel_pos_bias(jnp.asarray(table), window))
    assert got.shape == (1, h, n, n)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ws", [7, 12])
def test_swin_bias_matches_gather(ws):
    h = 3
    rng = np.random.default_rng(1)
    table = rng.standard_normal(((2 * ws - 1) ** 2, h), dtype=np.float32)
    idx = swin_rel_pos_index(ws)
    ref = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, h)
    ref = ref.transpose(2, 0, 1)
    got = np.asarray(rel_pos_bias_2d(jnp.asarray(table), ws, ws))
    np.testing.assert_array_equal(got, ref)


def test_beit_bias_grad_matches_gather():
    """Table gradient through the matmul construction equals the
    scatter-add gradient of the gather formulation."""
    import jax

    window = (4, 4)
    wh, ww = window
    n = wh * ww + 1
    h = 2
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal(
        ((2 * wh - 1) * (2 * ww - 1) + 3, h), dtype=np.float32))
    cot = jnp.asarray(rng.standard_normal((1, h, n, n), dtype=np.float32))
    idx = relative_position_index(window)

    def via_gather(t):
        rpb = t[idx.reshape(-1)].reshape(n, n, h)
        return jnp.sum(jnp.transpose(rpb, (2, 0, 1))[None] * cot)

    def via_matmul(t):
        return jnp.sum(beit_rel_pos_bias(t, window) * cot)

    g_ref = jax.grad(via_gather)(table)
    g_got = jax.grad(via_matmul)(table)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("window", [(14, 14), (3, 5), (4, 4)])
def test_compact_rel_pos_expands_to_full_bias(window):
    """The block-Toeplitz compact form (consumed in-kernel by the long-seq
    flash path) must expand to exactly beit_rel_pos_bias: stripe a of the
    patch-patch bias is the contiguous lane slice cr[:, :, wh-1-a : 2wh-1-a, :]
    and the cls row/col come from cls3."""
    from xfm_tpu.ops.relpos import compact_rel_pos

    wh, ww = window
    n = wh * ww + 1
    h = 4
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal(
        ((2 * wh - 1) * (2 * ww - 1) + 3, h), dtype=np.float32))
    full = np.asarray(beit_rel_pos_bias(table, window))[0]  # [H, N, N]
    cr, cls3 = compact_rel_pos(table, wh, ww)
    cr = np.asarray(cr)      # [H, ww, 2wh-1, ww]
    cls3 = np.asarray(cls3)  # [H, 3] = (cls->patch, patch->cls, cls->cls)

    got = np.zeros_like(full)
    got[:, 0, 0] = cls3[:, 2]
    got[:, 0, 1:] = cls3[:, 0][:, None]
    got[:, 1:, 0] = cls3[:, 1][:, None]
    p = wh * ww
    for a in range(wh):
        stripe = cr[:, :, wh - 1 - a: 2 * wh - 1 - a, :]  # [H, ww, wh, ww]
        got[:, 1 + a * ww: 1 + (a + 1) * ww, 1: 1 + p] = \
            stripe.reshape(h, ww, p)
    np.testing.assert_array_equal(got, full)


def test_compact_rel_pos_grad_matches_full():
    """d(table) through compact_rel_pos equals d(table) through the full
    construction when the cotangent is folded the way the kernel folds it."""
    import jax
    from xfm_tpu.ops.relpos import compact_rel_pos

    window = (4, 4)
    wh, ww = window
    n = wh * ww + 1
    h = 2
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal(
        ((2 * wh - 1) * (2 * ww - 1) + 3, h), dtype=np.float32))
    ds = jnp.asarray(rng.standard_normal((h, n, n), dtype=np.float32))
    p = wh * ww

    def via_full(t):
        return jnp.sum(beit_rel_pos_bias(t, window)[0] * ds)

    def via_compact(t):
        cr, cls3 = compact_rel_pos(t, wh, ww)
        total = (jnp.sum(cls3[:, 2] * ds[:, 0, 0])
                 + jnp.sum(cls3[:, 0] * jnp.sum(ds[:, 0, 1:], axis=-1))
                 + jnp.sum(cls3[:, 1] * jnp.sum(ds[:, 1:, 0], axis=-1)))
        for a in range(wh):
            stripe = cr[:, :, wh - 1 - a: 2 * wh - 1 - a, :]
            total += jnp.sum(stripe.reshape(h, ww, p)
                             * ds[:, 1 + a * ww: 1 + (a + 1) * ww, 1: 1 + p])
        return total

    g_ref = jax.grad(via_full)(table)
    g_got = jax.grad(via_compact)(table)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=0, atol=1e-5)
