"""fused (residual +) LayerNorm kernel: interpret-mode kernel vs the jnp
oracle (values + grads, incl. partial tail blocks), module param-compat
with nn.LayerNorm, and end-use patterns (post-LN BERT, pre-LN BEiT)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xfm_tpu.ops import fused_ln as fl  # noqa: E402


def _data(R, C, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (R, C), dtype) * 2 + 1
    y = jax.random.normal(ks[1], (R, C), dtype)
    gamma = jax.random.normal(ks[2], (C,)) * 0.3 + 1.0
    beta = jax.random.normal(ks[3], (C,)) * 0.1
    return x, y, gamma, beta


# R=300 with the 512-row block exercises a single partial block; R=1100
# exercises full blocks + a partial tail (masking in the bwd accumulators).
@pytest.mark.parametrize("R", [300, 1100])
@pytest.mark.parametrize("variant", ["plain", "post", "add"])
def test_kernel_matches_oracle_values_and_grads(R, variant):
    C = 256
    x, y, gamma, beta = _data(R, C)

    if variant == "plain":
        k_fn = lambda *a: fl.fused_ln(a[0], a[2], a[3], 1e-6, True)
        o_fn = lambda *a: fl._fwd_reference(a[0], None, a[2], a[3], 1e-6)[1]
    elif variant == "post":
        k_fn = lambda *a: fl.fused_ln_post(*a, 1e-6, True)
        o_fn = lambda *a: fl._fwd_reference(a[0], a[1], a[2], a[3], 1e-6)[1]
    else:
        k_fn = lambda *a: fl.fused_add_ln(*a, 1e-6, True)
        o_fn = lambda *a: fl._fwd_reference(a[0], a[1], a[2], a[3], 1e-6)

    got = k_fn(x, y, gamma, beta)
    want = o_fn(x, y, gamma, beta)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-5)

    # grads: weigh both outputs with different cotangents
    def loss(fn, x, y, gamma, beta):
        out = fn(x, y, gamma, beta)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(jnp.sin(l.astype(jnp.float32)) * (i + 1))
                   for i, l in enumerate(leaves))

    gk = jax.grad(lambda *a: loss(k_fn, *a), argnums=(0, 1, 2, 3))(
        x, y, gamma, beta)
    go = jax.grad(lambda *a: loss(o_fn, *a), argnums=(0, 1, 2, 3))(
        x, y, gamma, beta)
    names = ["dx", "dy", "dgamma", "dbeta"]
    for n, a, b in zip(names, gk, go):
        if variant == "plain" and n == "dy":
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=n)


def test_post_ln_residual_grad_aliases_dx():
    """fused_ln_post's bwd returns the same array for dx and dy."""
    x, y, gamma, beta = _data(64, 128)
    f = lambda x, y: jnp.sum(fl.fused_ln_post(x, y, gamma, beta) ** 2)
    dx, dy = jax.grad(f, argnums=(0, 1))(x, y)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dy))


def test_bf16_io():
    x, y, gamma, beta = _data(96, 128, dtype=jnp.bfloat16)
    xn, h = fl.fused_add_ln(x, y, gamma, beta, 1e-6, True)
    assert xn.dtype == jnp.bfloat16 and h.dtype == jnp.bfloat16
    want_xn, want_h = fl._fwd_reference(x, y, gamma, beta, 1e-6)
    np.testing.assert_allclose(np.asarray(xn, np.float32),
                               np.asarray(want_xn, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(want_h, np.float32), atol=1e-2)


def test_module_param_compat_and_equivalence():
    """FusedLayerNorm creates the same params as nn.LayerNorm and matches
    its output; with a residual it matches LN(x + y)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 9, 128))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 128))

    ours = fl.FusedLayerNorm(epsilon=1e-12)
    theirs = nn.LayerNorm(epsilon=1e-12)
    vo = ours.init(jax.random.PRNGKey(2), x)
    vt = theirs.init(jax.random.PRNGKey(2), x)
    assert jax.tree.structure(vo) == jax.tree.structure(vt)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(vo), jax.tree.leaves(vt)))

    np.testing.assert_allclose(np.asarray(ours.apply(vt, x)),
                               np.asarray(theirs.apply(vt, x)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours.apply(vt, x, residual=y)),
        np.asarray(theirs.apply(vt, x + y)), atol=1e-5)
    xn, h = ours.apply(vt, x, residual=y, return_sum=True)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(x + y),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h),
                               np.asarray(theirs.apply(vt, x + y)),
                               atol=1e-5)


def test_dispatch_declines_off_tpu():
    assert not fl.fused_ln_ok((8, 128), jnp.float32) or fl._on_tpu()
    assert not fl.fused_ln_ok((8, 100), jnp.float32)  # C % 128
    assert not fl.fused_ln_ok((8, 128), jnp.int32)
