"""Orbax native checkpoint save/restore roundtrip (preemption-safe resume,
reference Pretrain.py:438-445 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from xfm_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from xfm_tpu.train.train_state import TrainState


def test_save_restore_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    # take two steps so optimizer state is non-trivial
    for i in range(2):
        grads = jax.tree.map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads)
    assert int(state.step) == 2

    save_checkpoint(str(tmp_path / "ckpt"), state, step=2)

    fresh = TrainState.create(params, tx)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == 2
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(restored.params[k]),
                                   np.asarray(state.params[k]))
    # adam moments restored too
    s0 = jax.tree.leaves(state.opt_state)
    r0 = jax.tree.leaves(restored.opt_state)
    for a, b in zip(s0, r0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # restoring from an empty dir is a no-op
    untouched = restore_checkpoint(str(tmp_path / "nonexistent"), fresh)
    assert int(untouched.step) == 0
