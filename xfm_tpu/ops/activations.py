"""Fast erf-GELU for the TPU VPU.

XLA's f32 `erf` is a division-based rational approximation; on the VPU it
makes erf-GELU COMPUTE-bound at ~2.75x the HBM-bandwidth floor while
tanh-GELU runs AT the floor (measured: 1117 vs 403 us fwd on
[96,197,3072] bf16 — PERF.md).  `gelu_erf_fast` replaces it with a
high-order tanh-form approximation

    Phi(x) ~= 0.5 * (1 + tanh(xc * q(xc^2))),   xc = clamp(x, -6, 6)

(the classic 2-term tanh-GELU is the k=1 member of this family; this is
k=6, coefficients minimax-fitted by scripts/fit_gelu_poly.py).  tanh's
output sensitivity sech^2 squashes fit error in the tails, the polynomial
is evaluated in f32 with O(1)-sized coefficients (no cancellation), and
tanh saturation plus the clamp give exact tails (x for x >= 6, -0.0 for
x <= -6) with zero branches.

Accuracy (pinned exhaustively by tests/test_activations.py): for EVERY
finite bf16 input, |gelu_erf_fast(x) - gelu_erf(x)| <=
max(1 ulp_bf16, 2^-17); dense f32 max abs error 7.7e-7.  This is
erf-GELU at bf16 fidelity (and far inside the 2e-4 golden-parity
tolerance at f32), at tanh-GELU cost.

Reference activation: torch nn.GELU (erf) throughout
(reference models/xbert.py / models/beit2.py ACT2FN['gelu']).
"""
import os

import jax
import jax.numpy as jnp

# scripts/fit_gelu_poly.py k=6 (Lawson-weighted minimax in the bf16-ulp
# criterion); q(u) = sum C[i] * u^i, u = clamp(x, -6, 6)^2.
_C = (0.7978848218917847, 0.036333296447992325, -3.271320019848645e-05,
      -5.529103509616107e-05, 3.967791599279735e-06,
      -1.3290951983435662e-07, 1.7830662502049677e-09)


def gelu_erf_fast(x):
    """erf-GELU, bf16-exact (see module docstring), at tanh-GELU VPU cost.

    Gradients come from autodiff through the form itself: smooth, and the
    clamp gives exactly 1/0 slopes in the saturated tails.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -6.0, 6.0)
    u = xc * xc
    q = jnp.float32(_C[-1])
    for c in _C[-2::-1]:
        q = q * u + jnp.float32(c)
    return (xf * 0.5 * (1.0 + jnp.tanh(xc * q))).astype(dt)


def gelu_erf(x):
    """erf-GELU. Fast tanh-form by default; XFM_EXACT_ERF=1 forces XLA's
    erf (bit-level reference, ~2.75x the VPU cost — only needed when
    comparing against torch at tolerances below 1e-6)."""
    if os.environ.get("XFM_EXACT_ERF") == "1":
        return jax.nn.gelu(x, approximate=False)
    return gelu_erf_fast(x)
