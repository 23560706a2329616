"""Fast erf-GELU for the TPU VPU.

XLA's f32 `erf` is a division-based rational approximation; on the VPU it
makes erf-GELU COMPUTE-bound at ~2.75x the HBM-bandwidth floor while
tanh-GELU runs AT the floor (measured: 1198 vs 451 us fwd on
[96,197,3072] bf16 — PERF.md).  `gelu_erf_fast` replaces it with a
high-order tanh-form approximation

    Phi(x) ~= 0.5 * (1 + tanh(xc * q(xc^2))),   xc = clamp(x, -6, 6)

(the classic 2-term tanh-GELU is the k=1 member of this family; this is
k=4, coefficients minimax-fitted by scripts/fit_gelu_poly.py — the lowest
order with zero bf16-criterion violations).  tanh's output sensitivity
sech^2 squashes fit error in the tails, the polynomial is evaluated in f32
with O(1)-sized coefficients (no cancellation), and tanh saturation plus
the clamp give exact tails (x for x >= 6, -0.0 for x <= -6) with zero
branches.

The gradient is a custom_jvp using the ANALYTIC derivative
d gelu/dx = Phi(x) + x * pdf(x) (pdf exact via exp, Phi via the same
tanh form) instead of autodiff through the polynomial chain: measured
1075 -> ~700 us per fwd+bwd on [96,197,3072] bf16, and the gradient gets
MORE accurate (~1e-7 vs the chain's amplified fit error).  This is the
same split torch uses for nn.GELU's backward (erf forward, exp backward).

Accuracy (pinned exhaustively by tests/test_activations.py): for EVERY
finite bf16 input, |gelu_erf_fast(x) - gelu_erf(x)| <=
max(1 ulp_bf16, 2^-17); dense f32 max abs error 7.2e-6 (far inside the
2e-4 golden-parity tolerance).  This is erf-GELU at bf16 fidelity, at
near-tanh-GELU cost.

Reference activation: torch nn.GELU (erf) throughout
(reference models/xbert.py / models/beit2.py ACT2FN['gelu']).
"""
import os

import jax
import jax.numpy as jnp

# scripts/fit_gelu_poly.py k=4 (Lawson-weighted minimax in the bf16-ulp
# criterion; 0 violations on the full bf16 grid, max normalized err 0.854);
# q(u) = sum C[i] * u^i, u = clamp(x, -6, 6)^2.
_C = (0.7978764176368713, 0.03637675940990448, -7.985177944647148e-05,
      -3.7987665564287454e-05, 1.48881406403234e-06)

_INV_SQRT_2PI = 0.3989422804014327


def _phi_hat(xc):
    """Approximate standard-normal CDF on the clamped argument (f32)."""
    u = xc * xc
    q = jnp.float32(_C[-1])
    for c in _C[-2::-1]:
        q = q * u + jnp.float32(c)
    return 0.5 * (1.0 + jnp.tanh(xc * q))


@jax.custom_jvp
def gelu_erf_fast(x):
    """erf-GELU, bf16-exact (see module docstring), at tanh-GELU VPU cost."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -6.0, 6.0)
    return (xf * _phi_hat(xc)).astype(dt)


@gelu_erf_fast.defjvp
def _gelu_erf_fast_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -6.0, 6.0)
    phi = _phi_hat(xc)
    y = (xf * phi).astype(dt)
    # analytic d/dx = Phi + x * pdf; beyond the clamp the implemented
    # function is exactly x (or -0.0), so the slope is exactly 1 (or 0).
    pdf = jnp.exp(-0.5 * xc * xc) * jnp.float32(_INV_SQRT_2PI)
    d = phi + xf * pdf
    d = jnp.where(xf >= 6.0, 1.0, jnp.where(xf <= -6.0, 0.0, d))
    return y, (d * dx.astype(jnp.float32)).astype(dt)


def gelu_erf(x):
    """erf-GELU. Fast tanh-form by default; XFM_EXACT_ERF=1 forces XLA's
    erf (bit-level reference, ~2.75x the VPU cost — only needed when
    comparing against torch at tolerances below 1e-5)."""
    if os.environ.get("XFM_EXACT_ERF") == "1":
        return jax.nn.gelu(x, approximate=False)
    return gelu_erf_fast(x)
