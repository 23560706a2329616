"""Relative-position bias construction as dense one-hot matmuls.

The reference materializes the per-layer rel-pos bias with a table gather
(reference models/beit2.py:92-116 builds a [N, N] index and does
``table[index.view(-1)]``; reference models/swin_transformer.py does the
same per window). An XLA gather with ~39k scattered indices lowers to
serialized row loads on TPU — profiled at ~6 ms/step across the 12 BEiT
layers (PERF.md), recomputed again in the remat backward, plus a slower
scatter-add for the table gradient.

The rel-pos index is Toeplitz in each grid axis:
``idx[(a,ci),(b,cj)] = (a-b+wh-1)·(2ww-1) + (ci-cj+ww-1)``, so the gather
factors into two tiny one-hot matmuls over the (2w-1)-sized delta axes:

    U[(a,b), dj, h]       = T2d[a-b+wh-1, dj, h]        (OH_r @ T2d)
    V[(ci,cj), (a,b), h]  = U[(a,b), ci-cj+ww-1, h]     (OH_c @ U^T)

Each one-hot row selects exactly one element, so with f32 operands and f32
accumulation the result is **bit-exact** with the gather (0·x + 1·y = y for
finite tables). FLOPs are trivial (~25 MF/layer); the cost is one [H, P, P]
output write — dense, fused, and cheap in both forward and the autodiff
backward (the table gradient becomes two transposed matmuls instead of an
XLA scatter-add).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _onehot_delta(w: int) -> np.ndarray:
    """OH[(a, b), d] = 1.0 where a - b + (w-1) == d; [w², 2w-1] f32."""
    a = np.arange(w)
    d = (a[:, None] - a[None, :]) + (w - 1)               # [w, w]
    oh = np.zeros((w, w, 2 * w - 1), np.float32)
    oh[a[:, None], a[None, :], d] = 1.0
    return oh.reshape(w * w, 2 * w - 1)


def rel_pos_bias_2d(table, wh: int, ww: int, out_dtype=jnp.float32):
    """Patch-patch rel-pos bias from the first (2wh-1)·(2ww-1) table rows.

    table: [(2wh-1)·(2ww-1) (+ extras, ignored), H] — row-major over
    (row-delta, col-delta), the BEiT/Swin layout. → [H, wh·ww, wh·ww],
    bit-exact with ``table[idx]`` for finite tables at f32 (the one-hot
    matmuls select exactly one element each).

    ``out_dtype=bfloat16``: the construction matmuls stay f32-exact and
    the result is rounded ONCE, before the final (a,ci)/(b,cj) interleave
    transpose — at 480px that transpose moves [H, 900, 900] per layer and
    is the dominant construction cost (profiled ~24 ms/step incl. its
    AD transpose), so halving its bytes matters."""
    dh, dw = 2 * wh - 1, 2 * ww - 1
    h = table.shape[-1]
    t2d = table[: dh * dw].astype(jnp.float32).reshape(dh, dw * h)
    u = jnp.asarray(_onehot_delta(wh)) @ t2d              # [wh², dw·H]
    u = u.reshape(wh * wh, dw, h)
    u = jnp.transpose(u, (1, 0, 2)).reshape(dw, wh * wh * h)
    v = jnp.asarray(_onehot_delta(ww)) @ u                # [ww², wh²·H]
    v = v.astype(out_dtype).reshape(ww, ww, wh, wh, h)
    v = jnp.transpose(v, (4, 2, 0, 3, 1))                 # [H, a, ci, b, cj]
    return v.reshape(h, wh * ww, wh * ww)


def compact_rel_pos(table, wh: int, ww: int):
    """Compact block-Toeplitz factorization of the BEiT rel-pos bias.

    The full patch-patch bias ``bias[(a,ci),(b,cj),h] =
    T2d[a-b+wh-1, ci-cj+ww-1, h]`` is a block-Toeplitz arrangement of
    2wh-1 distinct [ww, ww] Toeplitz blocks per head — so the whole
    [H, P, P] bias is redundant by a factor ~wh. This returns the compact
    form the long-seq flash kernel expands **in VMEM** (killing the
    [H, 900, 900] interleave transpose + its AD mirror + the bias HBM
    materialization — the ~12 ms/step construction cost at 480px,
    PERF.md round-4 floor decomposition):

      cr  [H, ww, 2wh-1, ww]  with  cr[h, ci, e1, cj] =
                                     T2d[2wh-2-e1, ci-cj+ww-1, h]
      cls3 [H, 3] = (cls→patch table[-3], patch→cls table[-2],
                     cls→cls table[-1])  (reference models/beit2.py:99-116)

    The e1 axis is REVERSED so that query stripe ``a``'s bias rows are the
    contiguous lane slice ``cr[h, :, wh-1-a : 2wh-1-a, :]`` flattened to
    [ww, wh·ww] — inside the kernel each stripe is one static VMEM copy.
    Built from the table by one tiny one-hot matmul (f32-exact, bit-equal
    to the gather); differentiable, so the table gradient flows through
    JAX AD with no scatter."""
    dh, dw = 2 * wh - 1, 2 * ww - 1
    h = table.shape[-1]
    t2r = table[: dh * dw].astype(jnp.float32).reshape(dh, dw, h)[::-1]
    oh = jnp.asarray(_onehot_delta(ww))                   # [ww², dw]
    u = jnp.einsum("pd,edh->peh", oh, t2r)                # [ww², dh, H]
    cr = u.reshape(ww, ww, dh, h).transpose(3, 0, 2, 1)   # [H, ci, e1, cj]
    cls3 = jnp.stack([table[-3], table[-2], table[-1]],
                     axis=-1).astype(jnp.float32)         # [H, 3]
    return cr, cls3


def beit_rel_pos_bias(table, window, out_dtype=jnp.float32):
    """Full BEiT-2 bias incl. the 3 cls rows (reference models/beit2.py:
    99-116: row 0 = cls→all table[-3], col 0 = all→cls table[-2],
    [0,0] = cls→cls table[-1]). table: [(2wh-1)(2ww-1)+3, H] →
    [1, H, 1+wh·ww, 1+wh·ww] in ``out_dtype``."""
    wh, ww = window
    h = table.shape[-1]
    p = wh * ww
    patch = rel_pos_bias_2d(table, wh, ww, out_dtype)     # [H, P, P]
    t = table[-3:].astype(out_dtype)                      # [3, H]
    c2a = jnp.broadcast_to(t[0][:, None, None], (h, 1, p))
    a2c = jnp.broadcast_to(t[1][:, None, None], (h, p, 1))
    cc = t[2][:, None, None]                              # [H, 1, 1]
    row0 = jnp.concatenate([cc, c2a], axis=2)             # [H, 1, 1+P]
    rest = jnp.concatenate([a2c, patch], axis=2)          # [H, P, 1+P]
    return jnp.concatenate([row0, rest], axis=1)[None]
