"""Flax Swin Transformer — X-FM's third vision encoder option
(reference models/swin_transformer.py; Swin-B config from
reference configs/model/config_swinB_224.json).

Standard Swin: window attention with per-window relative position bias,
shifted windows on odd blocks, patch merging between stages. Output matches
the reference's usage in build_vision_encoder (reference models/xfm.py:173-198):
final-stage tokens with an avgpool "cls" prepended, width = 8×embed_dim.

TPU notes: window partitioning is pure reshape/transpose (layout-friendly);
the shifted-window attention mask is precomputed per stage as an additive
bias; attention runs through ops.dot_product_attention.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, NEG_INF
from ..ops.patch_embed import extract_patches
from .text_encoder import gelu_exact


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_res: int = 224
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def window_partition(x, ws):
    B, H, W, C = x.shape
    if H % ws or W % ws:
        # the reference's vendored Swin has no padding either (reference
        # models/swin_transformer.py:36-47 requires divisibility); its
        # configs pick window sizes that divide every stage (224/7, 384/12,
        # 480/15). Fail with the recipe instead of an opaque reshape error.
        raise ValueError(
            f"stage resolution {H}x{W} is not divisible by window_size "
            f"{ws}; pick a window size dividing image_res/patch_size and "
            "all its /2 stage reductions (e.g. 224→7, 384→12, 480→15)")
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // (H * W // ws // ws)
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def swin_rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attn_mask(H, W, ws, shift) -> np.ndarray:
    """[num_windows, ws², ws²] additive mask for shifted windows."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = window_partition(jnp.asarray(img), ws)
    wins = np.asarray(wins).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff == 0, 0.0, NEG_INF).astype(np.float32)


class SwinBlock(nn.Module):
    config: SwinConfig
    dim: int
    num_heads: int
    resolution: tuple[int, int]
    shift: int = 0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.config
        H, W = self.resolution
        ws = min(c.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0
        B, L, C = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1",
                         dtype=c.dtype)(x)
        x = x.reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins = window_partition(x, ws)                  # [B*nw, ws², C]

        nH = self.num_heads
        D = C // nH
        qkv = nn.Dense(3 * C, name="qkv", dtype=c.dtype)(wins)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # contiguous last-axis slices
        q = q.reshape(-1, ws * ws, nH, D)
        k = k.reshape(-1, ws * ws, nH, D)
        v = v.reshape(-1, ws * ws, nH, D)

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * ws - 1) ** 2, nH))
        from ..ops.relpos import rel_pos_bias_2d

        # dense one-hot-matmul construction (ops/relpos.py), bit-exact
        # with table[swin_rel_pos_index(ws)]
        bias = rel_pos_bias_2d(table, ws, ws)[None]      # [1,H,ws²,ws²]
        if shift > 0:
            amask = jnp.asarray(shift_attn_mask(H, W, ws, shift))
            nw = amask.shape[0]
            # tile bias per window group: reshape batch to [B, nw, ...]
            attn_bias = bias[None] + amask[None, :, None]  # [1,nw,H,ws²,ws²]
            attn_bias = jnp.broadcast_to(
                attn_bias, (B, nw, nH, ws * ws, ws * ws)).reshape(
                    B * nw, nH, ws * ws, ws * ws)
            out = dot_product_attention(q, k, v, bias=attn_bias,
                                        deterministic=deterministic)
        else:
            out = dot_product_attention(q, k, v, bias=bias,
                                        deterministic=deterministic)
        out = out.reshape(-1, ws * ws, C)
        out = nn.Dense(C, name="proj", dtype=c.dtype)(out)
        x = window_reverse(out, ws, H, W)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x.reshape(B, L, C)

        from .beit2 import DropPath

        dp = DropPath(self.drop_path)
        x = shortcut + dp(x, deterministic)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2",
                         dtype=c.dtype)(x)
        h = nn.Dense(int(C * c.mlp_ratio), name="fc1", dtype=c.dtype)(h)
        h = gelu_exact(h)
        h = nn.Dense(C, name="fc2", dtype=c.dtype)(h)
        return x + dp(h, deterministic)


class PatchMerging(nn.Module):
    config: SwinConfig
    resolution: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        c = self.config
        H, W = self.resolution
        B, L, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # channel order must be (0,0),(1,0),(0,1),(1,1) — the reference
        # concatenates [x0, x1, x2, x3] with x1 = x[:,1::2,0::2] (row offset
        # first; models/swin_transformer.py:321-325), so dw varies slower
        # than dh; imported reduction weights depend on this order
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, (H // 2) * (W // 2),
                                                  4 * C)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm",
                         dtype=c.dtype)(x)
        return nn.Dense(2 * C, use_bias=False, name="reduction",
                        dtype=c.dtype)(x)


class SwinTransformer(nn.Module):
    config: SwinConfig

    @nn.compact
    def __call__(self, images, mask=None, idx_to_group_img=None,
                 image_atts=None, deterministic=True):
        if mask is not None:
            # the reference Swin forward takes no MIM mask either
            # (reference models/swin_transformer.py:310); see clip_vit.py
            raise NotImplementedError(
                "Swin has no MIM mask path — use the BEiT-2 backbone for "
                "ret_mim / use_vision_tokenizer pretraining")
        c = self.config
        patches = extract_patches(images.astype(c.dtype), c.patch_size)
        x = nn.Dense(c.embed_dim, name="patch_embed", dtype=c.dtype)(patches)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="patch_norm",
                         dtype=c.dtype)(x)
        res = c.image_res // c.patch_size
        H = W = res
        dprs = np.linspace(0, c.drop_path_rate, sum(c.depths))
        di = 0
        for si, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            dim = c.embed_dim * 2 ** si
            for bi in range(depth):
                x = SwinBlock(c, dim=dim, num_heads=heads,
                              resolution=(H, W),
                              shift=0 if bi % 2 == 0 else
                              min(c.window_size, H, W) // 2,
                              drop_path=float(dprs[di]),
                              name=f"stage{si}_block{bi}")(
                    x, deterministic)
                di += 1
            if si < len(c.depths) - 1:
                x = PatchMerging(c, (H, W), name=f"merge{si}")(x)
                H, W = H // 2, W // 2
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm",
                         dtype=c.dtype)(x)
        pooled = jnp.mean(x, axis=1, keepdims=True)
        full = jnp.concatenate([pooled, x], axis=1)
        if idx_to_group_img is None:
            return full
        xg = jnp.take(x, idx_to_group_img, axis=0)
        w = image_atts[:, 1:].astype(xg.dtype)[..., None]
        pooled_g = jnp.sum(xg * w, 1, keepdims=True) / \
            jnp.maximum(jnp.sum(w, 1, keepdims=True), 1e-6)
        return jnp.concatenate([pooled_g, xg], axis=1), full
