"""Optimizer tests: 4-group AdamW semantics, LARS, bf16 master weights."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from xfm_tpu.train.optim import (boost_mask, create_optimizer, decay_mask,
                                 lars, with_master_weights)


def test_decay_and_boost_masks():
    """Reference optim.py:17-25 is a NAME-substring no-decay list: `temp`,
    LayerScale gammas and the head-MLP LayerNorm scales (torch Sequential
    numeric names) all DECAY; encoder LayerNorm scales and anything named
    *bias* do not."""
    params = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
              "norm1": {"scale": jnp.ones(4), "bias": jnp.ones(4)},
              "attn": {"q_bias": jnp.ones(4)},
              "gamma_1": jnp.ones(4),
              "mlm_head": {"layer_norm": {"scale": jnp.ones(4)}},
              "itm_head": {"fc1": {"kernel": jnp.ones((4, 8))},
                           "ln": {"scale": jnp.ones(8)}},
              "temp": jnp.ones(())}
    dm = decay_mask(params)
    assert dm["layer"]["kernel"] and not dm["layer"]["bias"]
    assert not dm["norm1"]["scale"] and not dm["norm1"]["bias"]
    assert not dm["attn"]["q_bias"]
    assert not dm["mlm_head"]["layer_norm"]["scale"]
    # torch names 'temp' / 'gamma_1' / 'itm_head.1.weight' match nothing in
    # the no-decay list -> decayed in the reference, mirrored here
    assert dm["temp"] and dm["gamma_1"] and dm["itm_head"]["ln"]["scale"]
    bm = boost_mask(params)
    assert bm["itm_head"]["fc1"]["kernel"] and bm["temp"]
    assert not bm["layer"]["kernel"]


def test_adamw_group_semantics():
    """Boosted params move lr_mult× further on the first step (where adam's
    normalized update is ±lr regardless of grad scale)."""
    params = {"base": {"kernel": jnp.ones((2, 2))},
              "itm_head": {"kernel": jnp.ones((2, 2))}}
    tx = create_optimizer(params, learning_rate=1e-3, weight_decay=0.0,
                          lr_mult=2.0, clip_grad_norm=None)
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.5, params)
    updates, _ = tx.update(grads, state, params)
    base = float(jnp.abs(updates["base"]["kernel"]).mean())
    boosted = float(jnp.abs(updates["itm_head"]["kernel"]).mean())
    np.testing.assert_allclose(boosted / base, 2.0, rtol=1e-5)


def test_master_weights_accumulates_small_updates():
    """Updates below bf16 resolution must still accumulate via the fp32
    master copy."""
    params = {"w": jnp.ones((4,), jnp.bfloat16) * 256.0}
    inner = optax.sgd(learning_rate=0.05)  # step of 0.05 ≪ bf16 ulp at 256
    tx = with_master_weights(inner)
    state = tx.init(params)
    p = params
    for _ in range(100):
        g = {"w": jnp.ones((4,), jnp.bfloat16)}
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
    # 100 × 0.05 = 5.0 total decrement; bf16 rounding of a *single* step
    # would have frozen at 256 (ulp at 256 is 2.0)
    np.testing.assert_allclose(np.asarray(p["w"], np.float32), 251.0,
                               atol=1.5)
    np.testing.assert_allclose(np.asarray(state["master"]["w"]), 251.0,
                               atol=1e-2)
    assert p["w"].dtype == jnp.bfloat16


def test_lars_skips_1d():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = lars(learning_rate=0.1, weight_decay=0.1, momentum=0.0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    # bias: plain SGD, no trust scaling/decay → -lr * grad
    np.testing.assert_allclose(np.asarray(upd["b"]), -0.1, rtol=1e-6)
    # kernel: trust-scaled
    assert not np.allclose(np.asarray(upd["w"]), -0.1)


def test_grad_accumulation_equals_big_batch():
    """N=2 accumulation == one 2x-batch step (reference Retrieval.py:55-65 /
    run_glue.py gradient_accumulation_steps semantics), through the real
    optimizer chain (clip + adam + wd)."""
    import jax
    import jax.numpy as jnp

    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.train_state import (TrainState, make_accum_train_step,
                                           make_train_step)

    r = np.random.RandomState(0)
    X = jnp.asarray(r.randn(8, 4), jnp.float32)
    Y = jnp.asarray(r.randn(8), jnp.float32)
    params = {"w": jnp.asarray(r.randn(4), jnp.float32),
              "b": jnp.zeros(())}

    def loss_fn(p, batch, rng):
        pred = batch["x"] @ p["w"] + p["b"]
        return jnp.mean((pred - batch["y"]) ** 2), {}

    def fresh_state():
        tx = create_optimizer(params, lambda s: 0.1, weight_decay=0.01,
                              clip_grad_norm=1.0)
        return TrainState.create(params, tx)

    rng = jax.random.PRNGKey(0)
    # one big-batch step
    s_big, m_big = make_train_step(loss_fn, donate=False)(
        fresh_state(), {"x": X, "y": Y}, rng)
    # two stacked micro-batches, one accumulated step
    stacked = {"x": X.reshape(2, 4, 4), "y": Y.reshape(2, 4)}
    s_acc, m_acc = make_accum_train_step(loss_fn, 2, donate=False)(
        fresh_state(), stacked, rng)

    np.testing.assert_allclose(np.asarray(s_big.params["w"]),
                               np.asarray(s_acc.params["w"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_big["grad_norm"]),
                               float(m_acc["grad_norm"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_big["loss"]), float(m_acc["loss"]),
                               rtol=1e-5)
    assert int(s_acc.step) == 1  # one optimizer step for K micro-batches
