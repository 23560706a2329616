"""Fused act-prologue matmul (ops/fused_mlp.py) vs the XLA composition —
interpret mode on CPU. The kernels compute act(h) in VMEM inside the
matmuls so the [*, intermediate] activated tensor never exists in HBM;
math must match `ACT[act](h) @ w + b` and its gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfm_tpu.models.text_encoder import ACT
from xfm_tpu.ops.fused_mlp import act_matmul


def rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("act", ["gelu_tanh", "gelu", "relu"])
@pytest.mark.parametrize("M", [48, 100])  # 100: padded-rows path
def test_fused_act_matmul_fwd_bwd(act, M):
    K, N = 128, 64
    h = rand((M, K), 0) * 2.0
    w = rand((K, N), 1) * 0.1
    b = rand((N,), 2) * 0.1
    g = rand((M, N), 3)

    def ref(h, w, b):
        return jnp.sum(g * (ACT[act](h) @ w + b))

    def fused(h, w, b):
        return jnp.sum(g * act_matmul(h, w, b, act, True))

    np.testing.assert_allclose(
        np.asarray(act_matmul(h, w, b, act, True)),
        np.asarray(ACT[act](h) @ w + b), atol=2e-3, rtol=1e-2)
    gr = jax.grad(ref, argnums=(0, 1, 2))(h, w, b)
    gf = jax.grad(fused, argnums=(0, 1, 2))(h, w, b)
    for a, x in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(x), atol=3e-3,
                                   rtol=1e-2)


def test_act_dense_module_param_compat(monkeypatch):
    """ActDense is a drop-in for ACT+nn.Dense: same param tree, same values
    on the default (unfused) path."""
    import flax.linen as nn

    from xfm_tpu.models.text_encoder import ActDense

    x = rand((4, 10, 32), 0)

    class Old(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="output_dense")(ACT["gelu_tanh"](x))

    class New(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ActDense(16, act="gelu_tanh", name="output_dense")(x)

    po = Old().init(jax.random.PRNGKey(0), x)["params"]
    pn = New().init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(po) == jax.tree.structure(pn)
    for a, b in zip(jax.tree.leaves(po), jax.tree.leaves(pn)):
        assert a.shape == b.shape
    yo = Old().apply({"params": po}, x)
    yn = New().apply({"params": po}, x)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yn), atol=1e-6)
