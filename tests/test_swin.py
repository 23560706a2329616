"""Swin transformer tests: window partition roundtrip, shifted-window path,
gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xfm_tpu.models.swin import (SwinConfig, SwinTransformer,
                                 window_partition, window_reverse,
                                 shift_attn_mask, swin_rel_pos_index)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 3)
    back = window_reverse(wins, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region_attention():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # mask is 0 on the diagonal (self-attention always allowed)
    for w in range(4):
        np.testing.assert_array_equal(np.diag(m[w]), np.zeros(16))
    # at least one window has blocked pairs (the wrapped ones)
    assert (m < -1e8).any()


def test_rel_pos_index_symmetry():
    idx = swin_rel_pos_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2
    # relative distance (i,j) and (j,i) map to mirrored entries
    assert idx[0, 5] != idx[5, 0] or idx[0, 5] == 24  # center only when equal


@pytest.mark.slow
def test_swin_shifted_blocks_forward_and_grad():
    cfg = SwinConfig(image_res=32, patch_size=4, embed_dim=16,
                     depths=(2, 2), num_heads=(2, 4), window_size=4,
                     drop_path_rate=0.0)  # depth 2 → block 1 is shifted
    m = SwinTransformer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 17, 32)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    gn = float(sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0
    # shifted block's rel-pos table receives gradient
    g1 = g["stage0_block1"]["relative_position_bias_table"]
    assert float(jnp.sum(jnp.abs(g1))) > 0
