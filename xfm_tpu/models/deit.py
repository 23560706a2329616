"""Flax DeiT/plain ViT — the reference's legacy vision encoder
(reference models/vit.py:106-247, timm-style ViT with GradCAM hooks at
models/vit.py:51-57,74).

Unreachable from the shipped configs (reference models/xfm.py:233-234 raises
when neither beit2/clip/swin is selected) but part of the model inventory, so
provided for completeness. The GradCAM hook surface maps to `prob_gate` on
`ops.dot_product_attention` — the gradient of a ones-valued gate is
attn ⊙ ∂L/∂attn, the same signal the torch hooks record.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..ops.patch_embed import extract_patches
from .text_encoder import gelu_exact


@dataclasses.dataclass(frozen=True)
class DeitConfig:
    image_res: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_res // self.patch_size) ** 2


class DeitBlock(nn.Module):
    config: DeitConfig

    @nn.compact
    def __call__(self, x, prob_gate=None, deterministic=True):
        c = self.config
        B, N, C = x.shape
        H = c.num_heads

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1",
                         dtype=c.dtype)(x)
        qkv = nn.Dense(3 * C, name="qkv", dtype=c.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # contiguous last-axis slices
        q = q.reshape(B, N, H, C // H)
        k = k.reshape(B, N, H, C // H)
        v = v.reshape(B, N, H, C // H)
        out = dot_product_attention(q, k, v, prob_gate=prob_gate,
                                    deterministic=deterministic)
        out = nn.Dense(C, name="proj", dtype=c.dtype)(out.reshape(B, N, C))
        x = x + nn.Dropout(c.drop_rate)(out, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2",
                         dtype=c.dtype)(x)
        h = nn.Dense(int(C * c.mlp_ratio), name="fc1", dtype=c.dtype)(h)
        h = gelu_exact(h)
        h = nn.Dense(C, name="fc2", dtype=c.dtype)(h)
        h = nn.Dropout(c.drop_rate)(h, deterministic=deterministic)
        return x + h


class DeitVisionTransformer(nn.Module):
    """Plain ViT: conv patch embed (as one matmul), cls token, learned abs
    pos-embed, pre-LN blocks, final LayerNorm; returns [B, 1+N, C] with the
    real cls token first (no avgpool readout, unlike BEiT-2)."""
    config: DeitConfig

    def setup(self):
        c = self.config
        self.patch_kernel = self.param(
            "patch_embed_kernel", nn.initializers.truncated_normal(0.02),
            (c.patch_size * c.patch_size * 3, c.embed_dim))
        self.patch_bias = self.param(
            "patch_embed_bias", nn.initializers.zeros, (c.embed_dim,))
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, c.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, c.num_patches + 1, c.embed_dim))
        self.blocks = [DeitBlock(c, name=f"block_{i}")
                       for i in range(c.depth)]
        self.norm = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm",
                                 dtype=c.dtype)

    def __call__(self, images, mask=None, idx_to_group_img=None,
                 image_atts=None, register_blk: int = -1,
                 prob_gate: Optional[jnp.ndarray] = None,
                 deterministic=True):
        """`register_blk`/`prob_gate` mirror the GradCAM hook registration of
        reference models/vit.py:74,51-57: the gate multiplies the attention
        probabilities of that block only. The legacy DeiT backbone (like the
        reference models/vit.py forward) has no MIM-mask or region mode —
        XFMBase.get_vision_embeds always passes those kwargs, so they are
        accepted and rejected loudly when set."""
        if mask is not None or idx_to_group_img is not None:
            raise NotImplementedError(
                "DeiT (use_deit) has no MIM mask or region mode — use the "
                "BEiT-2 backbone (reference models/vit.py has neither)")
        c = self.config
        x = extract_patches(images.astype(c.dtype), c.patch_size)
        x = x @ self.patch_kernel.astype(c.dtype) + \
            self.patch_bias.astype(c.dtype)
        B, N, C = x.shape
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (B, 1, C))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        for i, blk in enumerate(self.blocks):
            gate = prob_gate if i == register_blk else None
            x = blk(x, prob_gate=gate, deterministic=deterministic)
        return self.norm(x)
