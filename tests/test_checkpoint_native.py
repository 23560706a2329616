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


def test_async_save_then_restore(tmp_path):
    """block=False returns before the write completes; restore must flush the
    pending async save and read the just-written step (train-loop cadence:
    mid-run saves are async, pretrain tasks/pretrain.py)."""
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.sgd(1e-2)
    state = TrainState.create(params, tx)
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)

    d = str(tmp_path / "ckpt_async")
    save_checkpoint(d, state, step=1, block=False)
    # immediately restore: wait_for_checkpoints inside must see step 1
    restored = restore_checkpoint(d, TrainState.create(params, tx))
    assert int(restored.step) == 1
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(state.params["w"]))

    # a second async save at a later step supersedes, again visible on read
    state = state.apply_gradients(grads)
    save_checkpoint(d, state, step=2, block=False)
    restored = restore_checkpoint(d, TrainState.create(params, tx))
    assert int(restored.step) == 2
