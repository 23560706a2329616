"""Fit the tanh-form erf-GELU used by ops.activations.gelu_erf_fast.

Form:  Phi_hat(x) = 0.5 * (1 + tanh(xc * q(xc^2))),  xc = clamp(x, -6, 6),
       q = poly in u = xc^2;   gelu_hat(x) = x * Phi_hat(x).
True:  Phi(x) = 0.5 * (1 + erf(x / sqrt(2)));  gelu(x) = x * Phi(x).

Why this form: the target y(x) = artanh(erf(x/sqrt(2))) is smooth, the tanh
output derivative sech^2(y) decays ~4 e^{-2y} so tail fit error is
squashed, coefficients stay O(1) (no minimax-in-monomial cancellation), and
tanh saturation + the clamp give exact gelu tails (tanh(y(6)) rounds to 1.0
in f32) with no branches.  The classic 2-term tanh-GELU is k=1 here.

Acceptance criterion (the one tests/test_activations.py pins): for every
finite bf16 x, |gelu_hat - gelu| <= max(1 ulp_bf16(gelu), 2^-17).

Fits k = 3..6 by Lawson-weighted least squares (iteratively reweighted
toward minimax in criterion-normalized error) and prints float32
coefficients for ops/activations.py.
"""
import numpy as np
from scipy.special import erf

CLAMP = 6.0


def bf16_grid():
    bits = np.arange(0x0001, 0x7F80, dtype=np.uint32) << 16
    vals = np.frombuffer(bits.tobytes(), dtype=np.float32)
    vals = vals[np.isfinite(vals)]
    return np.concatenate([vals, -vals, [0.0]])


def ulp_bf16(y):
    ay = np.maximum(np.abs(y), 2.0 ** -126)
    ex = np.floor(np.log2(ay))
    return 2.0 ** (ex - 7)


def eval_gelu(c32, x64):
    """Simulate the f32 kernel: clamp, Horner in f32, tanh in f32."""
    x = x64.astype(np.float32)
    xc = np.clip(x, -CLAMP, CLAMP)
    u = xc * xc
    q = np.full_like(u, c32[-1])
    for ci in c32[-2::-1]:
        q = q * u + ci
    t = np.tanh(xc * q)
    return (x * np.float32(0.5) * (np.float32(1.0) + t)).astype(np.float64)


def fit(k, iters=200):
    x = np.concatenate([
        np.geomspace(1e-4, 0.5, 5000),
        np.linspace(0.01, CLAMP, 40000),
    ])
    x = np.sort(x)
    e = erf(x / np.sqrt(2.0))
    y = np.arctanh(np.clip(e, 0, 1 - 1e-16))
    t = y / x                              # q(u) target
    u = (x * x) / (CLAMP * CLAMP)          # normalized basis
    phi = 0.5 * (1.0 + e)
    gelu = x * phi
    # criterion-normalized sensitivity: d|gelu_err| per unit q-error
    sens = (0.5 / np.cosh(y) ** 2 * x * x
            / np.maximum(ulp_bf16(gelu), 2.0 ** -17))
    V = np.stack([u ** i for i in range(k + 1)], 1)

    w = sens.copy()
    best = None
    for _ in range(iters):
        W = w[:, None] * V
        c, *_ = np.linalg.lstsq(W, w * t, rcond=None)
        err = np.abs(sens * (V @ c - t))
        if best is None or err.max() < best[0]:
            best = (err.max(), c)
        w = w * (err / err.max() + 1e-9)
        w = w / w.max()
        w = np.maximum(w, 1e-9) ** 0.5 * sens  # keep tied to criterion
    c = best[1]
    # fold the basis normalization into the coefficients
    scale = np.array([(CLAMP * CLAMP) ** -i for i in range(k + 1)])
    return (c * scale).astype(np.float32)


def main():
    xs = bf16_grid().astype(np.float64)
    phi_true = 0.5 * (1.0 + erf(xs / np.sqrt(2.0)))
    gelu_true = xs * phi_true
    thresh = np.maximum(ulp_bf16(gelu_true), 2.0 ** -17)
    for k in range(3, 7):
        c32 = fit(k)
        derr = np.abs(eval_gelu(c32, xs) - gelu_true)
        bad = derr > thresh
        xd = np.linspace(0, CLAMP, 400001)
        perr = np.abs((eval_gelu(c32, xd) - xd * 0.5
                       * (1 + erf(xd / np.sqrt(2)))))
        print(f"k={k}: max gelu abs err (dense)={perr.max():.3e}  "
              f"bf16-grid violations={bad.sum()}/{len(xs)}  "
              f"max norm err={np.max(derr / thresh):.3f}")
        if bad.any():
            for j in np.argsort(derr / thresh)[-3:]:
                print(f"    x={xs[j]:+.6e} true={gelu_true[j]:+.6e} "
                      f"got={eval_gelu(c32, xs[j:j + 1])[0]:+.6e}")
        print("    coeffs (f32):", ", ".join(repr(float(v)) for v in c32))


if __name__ == "__main__":
    main()
