"""gelu_erf_fast accuracy contract: within 1 bf16 ulp (or 2^-17 absolute,
for the deep negative tail where true gelu is itself negligible) of true
erf-GELU for EVERY finite bf16 input — exhaustive, not sampled.

This is what licenses serving it as the default erf activation
(models/text_encoder.py gelu_exact) for erf-trained checkpoints."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from xfm_tpu.ops.activations import gelu_erf, gelu_erf_fast  # noqa: E402


def _all_finite_bf16():
    bits = np.arange(0x0001, 0x7F80, dtype=np.uint32) << 16
    vals = np.frombuffer(bits.tobytes(), dtype=np.float32)
    vals = vals[np.isfinite(vals)]
    return np.concatenate([vals, -vals, [0.0]]).astype(np.float32)


def _gelu_true_f64(x):
    from scipy.special import erf

    x = x.astype(np.float64)
    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def _ulp_bf16(y):
    ay = np.maximum(np.abs(y), 2.0 ** -126)
    return 2.0 ** (np.floor(np.log2(ay)) - 7)


def test_exhaustive_bf16_accuracy():
    xs = _all_finite_bf16()
    got = np.asarray(gelu_erf_fast(jnp.asarray(xs)), np.float64)
    true = _gelu_true_f64(xs)
    err = np.abs(got - true)
    thresh = np.maximum(_ulp_bf16(true), 2.0 ** -17)
    bad = err > thresh
    assert not bad.any(), (
        f"{bad.sum()} violations; worst x={xs[np.argmax(err / thresh)]}")


def test_bf16_io_dtype_and_tails():
    xs = jnp.asarray([-1e30, -7.0, -6.0, 6.0, 7.0, 1e30], jnp.bfloat16)
    out = gelu_erf_fast(xs)
    assert out.dtype == jnp.bfloat16
    xs32 = np.asarray(xs, np.float32)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray([0.0, 0.0, 0.0, xs32[3], xs32[4], xs32[5]], np.float32))
    # NaN propagates
    assert jnp.isnan(gelu_erf_fast(jnp.asarray(jnp.nan)))


def test_gradient_matches_true_derivative():
    xs = np.linspace(-5.5, 5.5, 4001).astype(np.float32)
    g = np.asarray(jax.vmap(jax.grad(gelu_erf_fast))(jnp.asarray(xs)))
    from scipy.special import erf

    x64 = xs.astype(np.float64)
    phi = np.exp(-x64 ** 2 / 2) / np.sqrt(2 * np.pi)
    true = 0.5 * (1 + erf(x64 / np.sqrt(2))) + x64 * phi
    assert np.abs(g - true).max() < 1e-4
    # saturated tails: exact 1 / 0 slopes
    gt = jax.vmap(jax.grad(gelu_erf_fast))(jnp.asarray([8.0, -8.0]))
    np.testing.assert_array_equal(np.asarray(gt), [1.0, 0.0])


def test_exact_erf_env_escape(monkeypatch):
    monkeypatch.setenv("XFM_EXACT_ERF", "1")
    x = jnp.asarray(np.linspace(-3, 3, 101), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gelu_erf(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)), rtol=0, atol=0)
