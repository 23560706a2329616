"""Flax CLIP-ViT vision tower — X-FM's alternative vision encoder
(reference models/clip_vit.py; HF CLIPVisionTransformer layout: pre-LN
blocks, class embedding + absolute position embedding, quick_gelu).

The region/local-attention mode (reference models/clip_vit.py:240-361) and
pos-embed interpolation (reference models/clip_vit.py:362) are handled by
the shared interpolation utilities in checkpoints/import paths.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, mask_to_bias
from ..ops.patch_embed import extract_patches
from .text_encoder import ACT


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_res: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    attention_dropout: float = 0.0
    local_attn_depth: int = 0  # last-k layers run region-local attention
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_res // self.patch_size) ** 2


class ClipEncoderLayer(nn.Module):
    config: ClipVisionConfig

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic=True):
        c = self.config
        H = c.num_attention_heads
        D = c.hidden_size // H
        B, N, _ = x.shape

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1",
                         dtype=c.dtype)(x)
        q = nn.Dense(c.hidden_size, name="q_proj", dtype=c.dtype)(h)
        k = nn.Dense(c.hidden_size, name="k_proj", dtype=c.dtype)(h)
        v = nn.Dense(c.hidden_size, name="v_proj", dtype=c.dtype)(h)
        q = q.reshape(B, N, H, D)
        k = k.reshape(B, N, H, D)
        v = v.reshape(B, N, H, D)
        ctx = dot_product_attention(q, k, v, bias=attn_bias,
                                    deterministic=deterministic)
        ctx = ctx.reshape(B, N, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, name="out_proj", dtype=c.dtype)(ctx)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2",
                         dtype=c.dtype)(x)
        h = nn.Dense(c.intermediate_size, name="fc1", dtype=c.dtype)(h)
        h = ACT[c.hidden_act](h)
        h = nn.Dense(c.hidden_size, name="fc2", dtype=c.dtype)(h)
        return x + h


class ClipVisionTransformer(nn.Module):
    config: ClipVisionConfig

    def setup(self):
        c = self.config
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,))
        self.patch_kernel = self.param(
            "patch_embed_kernel", nn.initializers.normal(0.02),
            (c.patch_size * c.patch_size * 3, c.hidden_size))
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.num_patches + 1, c.hidden_size))
        self.pre_layrnorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                         dtype=c.dtype)
        self.post_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           dtype=c.dtype)
        self.layers = [ClipEncoderLayer(c, name=f"layer_{i}")
                       for i in range(c.num_hidden_layers)]

    def __call__(self, images, mask=None, idx_to_group_img=None,
                 image_atts=None, deterministic=True):
        if mask is not None:
            # MIM masking is a BEiT-2 capability (its mask token is part of
            # the architecture); the reference clip_vit forward takes no
            # mask either (reference models/clip_vit.py:331). Silently
            # ignoring it would make get_mim_loss MSE(x, stop_grad(x)) = 0.
            raise NotImplementedError(
                "CLIP-ViT has no MIM mask path — use the BEiT-2 backbone "
                "for ret_mim / use_vision_tokenizer pretraining")
        c = self.config
        patches = extract_patches(images.astype(c.dtype), c.patch_size)
        x = patches @ self.patch_kernel.astype(c.dtype)  # CLIP conv has no bias
        B, N, C = x.shape
        cls = jnp.broadcast_to(
            self.class_embedding.astype(c.dtype)[None, None], (B, 1, C))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.position_embedding.astype(c.dtype)[None]
        x = self.pre_layrnorm(x)

        if idx_to_group_img is None:
            bias = mask_to_bias(image_atts) if image_atts is not None else None
            for layer in self.layers:
                x = layer(x, attn_bias=bias, deterministic=deterministic)
            return self.post_layernorm(x)

        if c.local_attn_depth > 0:
            # Region mode (reference models/clip_vit.py:240-361): the first
            # depth-k layers run full attention on the B original images; at
            # the split, per-region copies are gathered via idx_to_group_img
            # and the last k layers run with the region patch masks
            # ([R regions ‖ B full-attention rows] in one batch).
            split = c.num_hidden_layers - c.local_attn_depth
            for layer in self.layers[:split]:
                x = layer(x, attn_bias=None, deterministic=deterministic)
            xg = jnp.take(x, idx_to_group_img, axis=0)
            xall = jnp.concatenate([xg, x], axis=0)
            atts = jnp.concatenate(
                [image_atts.astype(jnp.float32),
                 jnp.ones(x.shape[:2], jnp.float32)], axis=0)
            bias = mask_to_bias(atts)
            for layer in self.layers[split:]:
                xall = layer(xall, attn_bias=bias,
                             deterministic=deterministic)
            out = self.post_layernorm(xall)
            R = idx_to_group_img.shape[0]
            return out[:R], out[R:]

        # local_attn_depth == 0 fallback: full attention throughout, region
        # readout by masked average pooling (mirrors the BEiT-2 region
        # readout, reference models/beit2.py:468-475).
        for layer in self.layers:
            x = layer(x, attn_bias=None, deterministic=deterministic)
        x = self.post_layernorm(x)
        xg = jnp.take(x, idx_to_group_img, axis=0)
        w = image_atts.astype(xg.dtype)[..., None]
        pooled = jnp.sum(xg[:, 1:] * w[:, 1:], axis=1, keepdims=True) / \
            jnp.maximum(jnp.sum(w[:, 1:], axis=1, keepdims=True), 1e-6)
        grouped = jnp.concatenate([pooled, xg[:, 1:]], axis=1)
        return grouped, x
