"""Patch embedding as a single MXU matmul.

The reference uses Conv2d(kernel=stride=patch) (reference models/beit2.py:209-230).
With stride == kernel the conv is exactly a reshape + matmul, which maps
straight onto the MXU with no im2col: [B,H,W,C] → [B, N, P*P*C] @ [P*P*C, D].

Images are NHWC throughout the framework (TPU-native layout); the checkpoint
importer folds torch's OIHW conv weight into the [P*P*C, D] kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def extract_patches(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/P)*(W/P), P*P*C] with row-major patch order
    matching torch Conv2d+flatten(2) (patches scan left-to-right, top-to-bottom;
    within a patch the feature order is (prow, pcol, channel))."""
    B, H, W, C = images.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = images.reshape(B, gh, P, gw, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, P, P, C
    return x.reshape(B, gh * gw, P * P * C)


def patchify_kernel_from_conv(conv_w: jnp.ndarray) -> jnp.ndarray:
    """Torch Conv2d weight [D, C, P, P] (OIHW) → matmul kernel [P*P*C, D]
    matching `extract_patches` feature order (prow, pcol, channel)."""
    D, C, P, _ = conv_w.shape
    w = jnp.transpose(conv_w, (2, 3, 1, 0))  # P, P, C, D
    return w.reshape(P * P * C, D)
