"""Micro-bench: fused Pallas attention vs XLA on the real chip, at the exact
shapes the XFM-base pretrain step uses.

Runs fwd+bwd through a 12-block dummy tower (matmul + attention) so the
comparison includes the real layout context, inside one donated lax.scan to
amortize tunnel dispatch (see PERF.md timing methodology).
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
    B = int(os.environ.get("AB_B", "96"))
    N = int(os.environ.get("AB_N", "197"))
    H, D = 12, 64
    iters = 20
    dtype = jnp.bfloat16

    from xfm_tpu.ops.attention import _xla_attention
    from xfm_tpu.ops.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, H * D), dtype)
    w = jnp.asarray(rng.randn(H * D, 3 * H * D) * 0.02, dtype)
    bias = jnp.asarray(rng.randn(1, H, N, N) * 0.1, jnp.float32)
    scale = D ** -0.5

    def tower(attn_fn, x, w):
        h = x
        for _ in range(12):
            qkv = (h @ w).reshape(B, N, 3, H, D)
            q, k, v = [jnp.squeeze(t, 2) for t in
                       jnp.split(qkv, 3, axis=2)]
            o = attn_fn(q, k, v)
            h = h + o.reshape(B, N, H * D)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def bench(name, attn_fn):
        @partial(jax.jit, donate_argnums=())
        def run(x, w):
            def body(c, _):
                w_c = w * (1.0 + c * 1e-30).astype(w.dtype)
                g = jax.grad(lambda w_: tower(attn_fn, x, w_))(w_c)
                return c + jnp.sum(g.astype(jnp.float32) ** 2), None

            out, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return out

        r = run(x, w)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(r)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        r = run(x, w * (1.0 + 1e-6))
        _ = float(r)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"{name}: {dt * 1e3:.2f} ms / 12-block fwd+bwd "
              f"(B={B}, N={N})")
        return dt

    def tower_packed(x, w):
        from xfm_tpu.ops.flash_attention import flash_attention_packed

        h = x
        for _ in range(12):
            qkv = h @ w
            o = flash_attention_packed(qkv, bias, scale, H)
            h = h + o
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def bench_packed():
        @partial(jax.jit, donate_argnums=())
        def run(x, w):
            def body(c, _):
                w_c = w * (1.0 + c * 1e-30).astype(w.dtype)
                g = jax.grad(lambda w_: tower_packed(x, w_))(w_c)
                return c + jnp.sum(g.astype(jnp.float32) ** 2), None

            out, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
            return out

        r = run(x, w)
        _ = float(r)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(r)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        r = run(x, w * (1.0 + 1e-6))
        _ = float(r)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"packed: {dt * 1e3:.2f} ms / 12-block fwd+bwd")
        return dt

    t_xla = bench("xla ", lambda q, k, v: _xla_attention(q, k, v, bias,
                                                         scale))
    t_fl = bench("flash", lambda q, k, v: flash_attention(q, k, v, bias,
                                                          scale))
    t_pk = bench_packed()
    print(f"flash speedup: {t_xla / t_fl:.3f}x, "
          f"packed speedup: {t_xla / t_pk:.3f}x")


if __name__ == "__main__":
    main()
