"""Micro-bench: fusion-tower attention shapes (ITM 3B-row pass) — XLA
(with/without attention dropout) vs the Pallas flash kernel.

Bounds the win from dispatching flash + in-kernel dropout for the text and
fusion towers (self 30x30, cross 30x197 at 3B=144 rows).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("CB_B", "144"))
    Nq = int(os.environ.get("CB_NQ", "30"))
    Nk = int(os.environ.get("CB_NK", "197"))
    H, D = 12, 64
    iters = 50
    dtype = jnp.bfloat16

    from xfm_tpu.ops.attention import _xla_attention, _dropout_attention
    from xfm_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randn(B, Nq, H * D), dtype)
    xk = jnp.asarray(rng.randn(B, Nk, H * D), dtype)
    wq = jnp.asarray(rng.randn(H * D, H * D) * 0.02, dtype)
    wk = jnp.asarray(rng.randn(H * D, H * D) * 0.02, dtype)
    wv = jnp.asarray(rng.randn(H * D, H * D) * 0.02, dtype)
    bias = jnp.asarray((rng.rand(B, 1, 1, Nk) > 0.1) * -1e9, jnp.float32)
    scale = D ** -0.5
    key = jax.random.PRNGKey(0)

    def tower(attn_fn, xq, xk, wq, wk, wv):
        h = xq
        for _ in range(12):
            q = (h @ wq).reshape(B, Nq, H, D)
            k = (xk @ wk).reshape(B, Nk, H, D)
            v = (xk @ wv).reshape(B, Nk, H, D)
            o = attn_fn(q, k, v)
            h = h + o.reshape(B, Nq, H * D)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def bench(name, attn_fn):
        @jax.jit
        def run(xq, xk, wq, wk, wv):
            def body(c, _):
                # carry feeds the weights: stops XLA hoisting the whole
                # (loop-invariant) grad computation out of the scan
                w_c = wq * (1.0 + c * 1e-30).astype(wq.dtype)
                g = jax.grad(lambda w_: tower(attn_fn, xq, xk, w_, wk,
                                              wv))(w_c)
                return c + jnp.sum(g.astype(jnp.float32) ** 2), None

            out, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return out

        r = run(xq, xk, wq, wk, wv)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(r)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        r = run(xq, xk, wq * (1 + 1e-6), wk, wv)
        _ = float(r)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"{name}: {dt * 1e3:.3f} ms / 12-layer fwd+bwd "
              f"(B={B}, {Nq}x{Nk})")
        return dt

    t0 = bench("xla no-drop ", lambda q, k, v: _xla_attention(
        q, k, v, bias, scale))
    t1 = bench("xla dropout ", lambda q, k, v: _dropout_attention(
        q, k, v, bias, scale, 0.1, key, False))
    t2 = bench("flash       ", lambda q, k, v: flash_attention(
        q, k, v, bias, scale))
    print(f"dropout tax: {t1 / t0:.2f}x; flash vs xla-no-drop: "
          f"{t0 / t2:.2f}x; flash vs xla-drop: {t1 / t2:.2f}x")


if __name__ == "__main__":
    main()
