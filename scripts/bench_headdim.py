"""Head-dim layout experiment for the packed attention kernel (ROADMAP /
VERDICT r3 item: "pack 2 heads per 128-lane tile, or a (q, 64) layout, to
kill the 64->128 padding").

The MXU is a 128x128 systolic array; for the D=64 score matmul
[nq, 64] @ [64, Nkp] the contraction dim fills only half the array. The
cycle model says any block-diagonal 2-head packing is a wash:

  per head        [nq, K=64 ] @ [64,  Nkp ] -> ceil(64/128)=1 K-pass x
                                               ceil(Nkp/128) N-tiles
  2-head blockdiag [nq, K=128] @ [128, 2Nkp] -> 1 K-pass x 2x N-tiles
  = identical MAC issue slots; the packing only adds VPU work to build the
  zero-padded block-diagonal operand.

This bench measures the three layouts directly as pallas kernels at the
pretrain shape (nq=Nkp=208, D=64) so the conclusion is empirical, not just
modeled. Run on the real chip; prints one JSON line per variant.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, H, N, D = 48, 12, 208, 64
ITERS = 50


def _kernel_per_head(q_ref, k_ref, o_ref):
    # current scheme: one [nq, 64] @ [64, Nkp] dot per head (2 heads/window)
    for j in range(2):
        sl = slice(j * D, (j + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, j * N:(j + 1) * N] = s.astype(o_ref.dtype)


def _kernel_blockdiag(q_ref, k_ref, o_ref):
    # 2-head packing: [nq, 128] @ [128, 2*Nkp] with a block-diagonal K'
    q = q_ref[0]                                   # [nq, 128] both heads
    k1 = k_ref[0, :, 0:D]                          # [Nkp, 64]
    k2 = k_ref[0, :, D:2 * D]
    z = jnp.zeros_like(k1)
    kp = jnp.concatenate(
        [jnp.concatenate([k1, z], axis=1),         # rows contract: [2Nkp,128]
         jnp.concatenate([z, k2], axis=1)], axis=0)
    s = jax.lax.dot_general(q, kp, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = s.astype(o_ref.dtype)               # [nq, 2*Nkp]


def _kernel_padded(q_ref, k_ref, o_ref):
    # v1 regression scheme: zero-pad D 64 -> 128 per head
    for j in range(2):
        sl = slice(j * D, (j + 1) * D)
        q = jnp.pad(q_ref[0, :, sl], ((0, 0), (0, 128 - D)))
        k = jnp.pad(k_ref[0, :, sl], ((0, 0), (0, 128 - D)))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, j * N:(j + 1) * N] = s.astype(o_ref.dtype)


def run_variant(name, kernel):
    r = np.random.RandomState(0)
    # [B*H/2, N, 128]: each row carries a 2-head 128-lane window
    q = jnp.asarray(r.randn(B * H // 2, N, 2 * D), jnp.bfloat16)
    k = jnp.asarray(r.randn(B * H // 2, N, 2 * D), jnp.bfloat16)

    call = pl.pallas_call(
        kernel,
        grid=(B * H // 2,),
        in_specs=[pl.BlockSpec((1, N, 2 * D), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, N, 2 * D), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, N, 2 * N), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H // 2, N, 2 * N), jnp.bfloat16),
    )

    @jax.jit
    def many(q, k):
        def body(c, _):
            return c + jnp.sum(call(q, k)[0, 0, 0:1]), ()

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16),
                              jnp.arange(ITERS))
        return tot

    out = many(q, k)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(many(q, k))
    rtt = (time.perf_counter() - t0) / 3 * 0  # folded into measurement noise
    t0 = time.perf_counter()
    _ = float(many(q, k))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"variant": name, "us_per_layer_scores": round(
        dt * 1e6, 1)}), flush=True)
    return dt


def main():
    a = run_variant("per_head_d64", _kernel_per_head)
    b = run_variant("blockdiag_2head_k128", _kernel_blockdiag)
    c = run_variant("padded_d128", _kernel_padded)
    print(json.dumps({"verdict": "blockdiag/current ratio",
                      "ratio": round(b / a, 3),
                      "padded/current": round(c / a, 3)}), flush=True)


if __name__ == "__main__":
    main()
