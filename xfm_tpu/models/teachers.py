"""Frozen teacher towers for VQ-KD tokenizer training
(reference models/vqkd_teacher/: OpenAI CLIP ViT-B/16 and DINO ViT-B/16).

The VQ-KD decoder regresses the teacher's token features
(reference models/model_vqkd.py:182: `encode_image(..., return_all_tokens=
True) @ visual.proj`). Both teachers reuse this repo's vision towers; a
`ScalingLayer` re-normalizes our CLIP-normalized pipeline inputs to each
teacher's expected statistics (reference models/model_vqkd.py:222
ScalingLayerForClip).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.transforms import CLIP_MEAN, CLIP_STD
from .beit2 import BeitVisionTransformer, VisionConfig
from .clip_vit import ClipVisionConfig, ClipVisionTransformer

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def renormalize(images, src_mean, src_std, dst_mean, dst_std):
    """Convert images normalized with (src) stats to (dst) stats."""
    src_mean = jnp.asarray(src_mean)
    src_std = jnp.asarray(src_std)
    dst_mean = jnp.asarray(dst_mean)
    dst_std = jnp.asarray(dst_std)
    raw = images * src_std + src_mean
    return (raw - dst_mean) / dst_std


class CLIPTeacher(nn.Module):
    """CLIP ViT-B/16 image tower + visual.proj: all-token projected features
    (reference models/vqkd_teacher/clip/model.py:226-305)."""
    config: ClipVisionConfig = ClipVisionConfig()
    proj_dim: int = 512

    @nn.compact
    def __call__(self, images, deterministic=True):
        tower = ClipVisionTransformer(self.config, name="visual")
        tokens = tower(images, deterministic=deterministic)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.config.hidden_size, self.proj_dim))
        # patch tokens only (cls dropped), projected
        return tokens[:, 1:, :] @ proj.astype(tokens.dtype)


def dino_vit_base(image_res: int = 224, dtype: Any = jnp.float32):
    """DINO ViT-B/16 config: plain ViT — abs pos embed, no rel-pos bias, no
    LayerScale, final LayerNorm (reference models/vqkd_teacher/dino.py:133)."""
    return VisionConfig(
        image_res=image_res, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, init_values=0.0, use_rel_pos_bias=False,
        use_abs_pos_emb=True, use_mean_pooling=False, drop_path_rate=0.0,
        layer_norm_eps=1e-6, dtype=dtype)


class DINOTeacher(nn.Module):
    """DINO ViT-B/16: patch tokens after the final norm."""
    image_res: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic=True):
        tower = BeitVisionTransformer(dino_vit_base(self.image_res,
                                                    self.dtype),
                                      name="backbone")
        out = tower(images, deterministic=deterministic)
        return out[:, 1:, :]  # patch tokens (avgpool slot dropped)


def teacher_features(teacher, variables, images, pipeline="clip"):
    """Run a frozen teacher on pipeline-normalized images."""
    if pipeline == "clip":
        pass  # CLIP teacher expects CLIP stats — our pipeline default
    else:
        images = renormalize(images, CLIP_MEAN, CLIP_STD, IMAGENET_MEAN,
                             IMAGENET_STD)
    return jax.lax.stop_gradient(teacher.apply(variables, images))
