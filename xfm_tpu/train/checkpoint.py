"""Checkpointing: Orbax for native checkpoints + a torch `.th` importer.

The importer reproduces the reference's checkpoint surgery
(reference models/xfm.py:26-78,408-468; models/beit2.py:572-849): prefix
renames, HF module nesting (`text_encoder.roberta.*`, `fusion_encoder.roberta.*`),
Sequential-index MLP heads, conv→matmul patch embedding, and pos-embed /
relative-position-bias interpolation for resolution changes.

Everything operates on numpy arrays so torch is only needed to `torch.load`
the file itself (kept optional).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.beit2 import VisionConfig, num_relative_distance
from ..models.text_encoder import TextConfig


# ---------------------------------------------------------------------------
# torch state-dict loading

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "module" in ckpt:
        ckpt = ckpt["module"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().float().numpy()
    return out


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def choose_layers(sd: Dict[str, np.ndarray], prefix: str,
                  mapper: Dict[int, int]) -> Dict[str, np.ndarray]:
    """Layer-subset remapping for initializing an N-layer encoder from an
    M-layer checkpoint (reference models/xfm.py:64-78
    load_params_choose_layers): `<prefix>.{src}.` keys become
    `<prefix>.{dst}.`; unmapped layers under `prefix` are dropped."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if not k.startswith(prefix + "."):
            out[k] = v
            continue
        rest = k[len(prefix) + 1:]
        head, _, tail = rest.partition(".")
        if head.isdigit():
            src = int(head)
            if src in mapper:
                out[f"{prefix}.{mapper[src]}.{tail}"] = v
            # else: dropped
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# interpolation utilities (reference models/beit2.py:572-849)

def _bicubic_axis_weights(src_len: int, dst_len: int):
    """Per-output-row 4-tap indices/weights of torch's bicubic resize
    (`F.interpolate(mode='bicubic', align_corners=False)`): half-pixel
    source coordinates, Keys cubic-convolution kernel with A = −0.75,
    border-replicated taps."""
    scale = src_len / dst_len
    x = (np.arange(dst_len, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    A = -0.75

    def k(d):
        d = np.abs(d)
        return np.where(
            d <= 1.0, ((A + 2.0) * d - (A + 3.0)) * d * d + 1.0,
            np.where(d < 2.0, (((d - 5.0) * d + 8.0) * d - 4.0) * A, 0.0))

    taps = x0[:, None] + np.arange(-1, 3)[None, :]          # [dst, 4]
    w = k(taps - x[:, None]).astype(np.float32)
    idx = np.clip(taps, 0, src_len - 1)
    return idx, w


def interpolate_abs_pos_embed(pos: np.ndarray, num_patches: int,
                              num_extra_tokens: int = 1) -> np.ndarray:
    """Bicubic 2D interpolation of absolute position embeddings
    (reference models/beit2.py:826-849, models/xfm.py:455-462).

    Implements torch's `F.interpolate(mode='bicubic',
    align_corners=False)` convolution (A = −0.75 Keys kernel, half-pixel
    sampling, replicated borders) from scratch — `jax.image.resize`'s
    'cubic' uses the A = −0.5 kernel and diverges from the reference by up
    to ~0.3 on unit-variance tables (pinned by
    tests/test_interpolation_golden.py)."""
    if pos.ndim == 2:
        pos = pos[None]
    n_old = pos.shape[1] - num_extra_tokens
    if n_old == num_patches:
        return pos
    g_old = int(round(n_old ** 0.5))
    g_new = int(round(num_patches ** 0.5))
    extra = pos[:, :num_extra_tokens]
    grid = np.asarray(pos[:, num_extra_tokens:], np.float32).reshape(
        1, g_old, g_old, -1)
    idx, w = _bicubic_axis_weights(g_old, g_new)
    # separable: rows then cols (same weights — square grid)
    grid = np.einsum("ia,biawc->biwc", w, grid[:, idx])     # [1,gn,g_old,C]
    grid = np.einsum("ja,bijac->bijc", w, grid[:, :, idx])  # [1,gn,gn,C]
    grid = grid.reshape(1, g_new * g_new, -1)
    return np.concatenate([extra, grid], axis=1)


def interpolate_rel_pos_bias_table(table: np.ndarray,
                                   dst_window: tuple[int, int]) -> np.ndarray:
    """Geometric-progression interpolation of BEiT-2 relative-position bias
    tables across window sizes (reference models/beit2.py:572-701). The 3
    trailing cls distances are carried over unchanged."""
    src_num, heads = table.shape
    dst_num = num_relative_distance(dst_window)
    if src_num == dst_num:
        return table
    src_size = int(round((src_num - 3) ** 0.5))
    dst_size = 2 * dst_window[0] - 1
    extra = table[-3:]
    body = table[:-3].reshape(src_size, src_size, heads)

    # geometric spacing of source coordinates; the q binary search mirrors
    # the reference EXACTLY (bounds 1.01/1.5, interval tolerance 1e-6, last
    # midpoint used) — a tighter search lands on a slightly different q and
    # drifts the resampled table ~2e-4 (reference models/beit2.py:782-800)
    def geometric_points(n, target_half):
        left, right = 1.01, 1.5
        q = (left + right) / 2.0
        while right - left > 1e-6:
            q = (left + right) / 2.0
            gp = (1.0 - q ** (n // 2)) / (1.0 - q)
            if gp > target_half:
                right = q
            else:
                left = q
        dis = []
        cur = 1.0
        for i in range(n // 2):
            dis.append(cur)
            cur += q ** (i + 1)
        r = [-d for d in reversed(dis)]
        return np.array(r + [0.0] + dis) if n % 2 == 1 else np.array(
            r + dis)

    src_x = geometric_points(src_size, (dst_size // 2) * 1.0) \
        if src_size != dst_size else np.arange(src_size, dtype=np.float64)
    if src_size != dst_size:
        dst_x = np.arange(-(dst_size // 2), dst_size // 2 + 1, dtype=np.float64)
    else:
        dst_x = src_x

    from scipy import interpolate as si

    out = np.zeros((dst_size, dst_size, heads), np.float32)
    for h in range(heads):
        f = si.RectBivariateSpline(src_x, src_x, body[:, :, h].astype(np.float64),
                                   kx=min(3, src_size - 1),
                                   ky=min(3, src_size - 1))
        out[:, :, h] = f(dst_x, dst_x).astype(np.float32)
    return np.concatenate([out.reshape(dst_size * dst_size, heads),
                           extra], axis=0)


# ---------------------------------------------------------------------------
# text encoder import (HF roberta/bert fork naming → TextTransformer tree)

def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def import_text_encoder(sd: Dict[str, np.ndarray], config: TextConfig,
                        with_mlm: bool = False) -> Dict[str, Any]:
    """`sd` is rooted at the bare model (e.g. after stripping
    'text_encoder.roberta.'). Produces the TextTransformer param subtree."""
    p: Dict[str, Any] = {}
    emb = "embeddings"
    p["embeddings"] = {
        "word_embeddings": {"embedding": sd[f"{emb}.word_embeddings.weight"]},
        "position_embeddings": {
            "embedding": sd[f"{emb}.position_embeddings.weight"]},
        "token_type_embeddings": {
            "embedding": sd[f"{emb}.token_type_embeddings.weight"]},
        "LayerNorm": _ln(sd, f"{emb}.LayerNorm"),
    }
    for i in range(config.num_hidden_layers):
        b = f"encoder.layer.{i}"
        layer = {
            "attention": {
                "query": _dense(sd, f"{b}.attention.self.query"),
                "key": _dense(sd, f"{b}.attention.self.key"),
                "value": _dense(sd, f"{b}.attention.self.value"),
                "attn_out": _dense(sd, f"{b}.attention.output.dense"),
                "output_LayerNorm": _ln(sd, f"{b}.attention.output.LayerNorm"),
            },
            "intermediate_dense": _dense(sd, f"{b}.intermediate.dense"),
            "output_dense": _dense(sd, f"{b}.output.dense"),
            "ffn_LayerNorm": _ln(sd, f"{b}.output.LayerNorm"),
        }
        if f"{b}.crossattention.self.query.weight" in sd:
            layer["crossattention"] = {
                "query": _dense(sd, f"{b}.crossattention.self.query"),
                "key": _dense(sd, f"{b}.crossattention.self.key"),
                "value": _dense(sd, f"{b}.crossattention.self.value"),
                "attn_out": _dense(sd, f"{b}.crossattention.output.dense"),
                "output_LayerNorm": _ln(sd,
                                        f"{b}.crossattention.output.LayerNorm"),
            }
        p[f"layer_{i}"] = layer

    if with_mlm:
        if "lm_head.dense.weight" in sd:  # roberta naming
            p["mlm_head"] = {
                "dense": _dense(sd, "lm_head.dense"),
                "layer_norm": _ln(sd, "lm_head.layer_norm"),
                "bias": sd.get("lm_head.bias",
                               sd.get("lm_head.decoder.bias")),
            }
        elif "cls.predictions.transform.dense.weight" in sd:  # bert naming
            p["mlm_head"] = {
                "dense": _dense(sd, "cls.predictions.transform.dense"),
                "layer_norm": _ln(sd, "cls.predictions.transform.LayerNorm"),
                "bias": sd["cls.predictions.bias"],
            }
    return p


# ---------------------------------------------------------------------------
# BEiT-2 import

def import_beit2(sd: Dict[str, np.ndarray], config: VisionConfig) -> Dict[str, Any]:
    from ..ops.patch_embed import patchify_kernel_from_conv

    p: Dict[str, Any] = {
        "patch_embed_kernel": np.asarray(
            patchify_kernel_from_conv(jnp.asarray(sd["patch_embed.proj.weight"]))),
        "patch_embed_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"],
    }
    if "mask_token" in sd:  # absent in VQ-KD tokenizer encoders
        p["mask_token"] = sd["mask_token"]
    if "pos_embed" in sd and config.use_abs_pos_emb:
        p["pos_embed"] = interpolate_abs_pos_embed(sd["pos_embed"],
                                                   config.num_patches)
    window = (config.grid_size, config.grid_size)
    for i in range(config.depth):
        b = f"blocks.{i}"
        attn = {
            "qkv": {"kernel": sd[f"{b}.attn.qkv.weight"].T},
            "q_bias": sd[f"{b}.attn.q_bias"],
            "v_bias": sd[f"{b}.attn.v_bias"],
            "proj": _dense(sd, f"{b}.attn.proj"),
        }
        if f"{b}.attn.relative_position_bias_table" in sd:
            # absent in VQ-KD tokenizer encoders (abs-pos-embed only)
            attn["relative_position_bias_table"] = \
                interpolate_rel_pos_bias_table(
                    sd[f"{b}.attn.relative_position_bias_table"], window)
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
            "attn": attn,
        }
        if f"{b}.gamma_1" in sd:  # LayerScale checkpoints only
            blk["gamma_1"] = sd[f"{b}.gamma_1"]
            blk["gamma_2"] = sd[f"{b}.gamma_2"]
        p[f"block_{i}"] = blk
    if "fc_norm.weight" in sd:
        p["fc_norm"] = _ln(sd, "fc_norm")
    elif "norm.weight" in sd:
        p["final_norm"] = _ln(sd, "norm")
    return p


# ---------------------------------------------------------------------------
# CLIP-ViT import (HF clip-vit-base naming; reference models/xfm.py:147-170)

def import_clip_vit(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """`sd` rooted at the HF vision tower (keys under 'vision_model.' or the
    reference's stripped names). Maps onto ClipVisionTransformer."""
    if any(k.startswith("vision_model.") for k in sd):
        sd = strip_prefix(sd, "vision_model.")
    emb = {k[len("embeddings."):]: v for k, v in sd.items()
           if k.startswith("embeddings.")}
    if emb:
        sd = {**sd, **emb}
    from ..ops.patch_embed import patchify_kernel_from_conv

    conv_key = ("patch_embedding.weight" if "patch_embedding.weight" in sd
                else "patch_embed.weight")
    pos_key = ("position_embedding.weight" if "position_embedding.weight"
               in sd else "pos_embed.weight")
    pos = sd[pos_key]
    if pos.shape[0] - 1 != config.num_patches:
        pos = interpolate_abs_pos_embed(pos[None],
                                        config.num_patches)[0]
    p: Dict[str, Any] = {
        "class_embedding": sd["class_embedding"].reshape(-1),
        "patch_embed_kernel": np.asarray(
            patchify_kernel_from_conv(jnp.asarray(sd[conv_key]))),
        "position_embedding": pos,
        "pre_layrnorm": _ln(sd, "pre_layrnorm"),
        "post_layernorm": _ln(sd, "post_layernorm"),
    }
    for i in range(config.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, f"{b}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{b}.layer_norm2"),
            "q_proj": _dense(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{b}.self_attn.out_proj"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
        }
    return p


def import_openai_clip_visual(sd: Dict[str, np.ndarray],
                              config) -> Dict[str, Any]:
    """OpenAI-CLIP checkpoint naming (reference models/vqkd_teacher/clip/
    model.py VisionTransformer: conv1 / ln_pre / transformer.resblocks.N /
    ln_post / proj, fused attn.in_proj) → ClipVisionTransformer tree.
    `sd` rooted at 'visual.'."""
    from ..ops.patch_embed import patchify_kernel_from_conv

    pos = sd["positional_embedding"]
    if pos.shape[0] - 1 != config.num_patches:
        pos = interpolate_abs_pos_embed(pos[None], config.num_patches)[0]
    p: Dict[str, Any] = {
        "class_embedding": sd["class_embedding"].reshape(-1),
        "patch_embed_kernel": np.asarray(
            patchify_kernel_from_conv(jnp.asarray(sd["conv1.weight"]))),
        "position_embedding": pos,
        "pre_layrnorm": _ln(sd, "ln_pre"),
        "post_layernorm": _ln(sd, "ln_post"),
    }
    C = config.hidden_size
    for i in range(config.num_hidden_layers):
        b = f"transformer.resblocks.{i}"
        w = sd[f"{b}.attn.in_proj_weight"]   # [3C, C] fused qkv
        bias = sd[f"{b}.attn.in_proj_bias"]  # [3C]
        p[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, f"{b}.ln_1"),
            "layer_norm2": _ln(sd, f"{b}.ln_2"),
            "q_proj": {"kernel": w[:C].T, "bias": bias[:C]},
            "k_proj": {"kernel": w[C:2 * C].T, "bias": bias[C:2 * C]},
            "v_proj": {"kernel": w[2 * C:].T, "bias": bias[2 * C:]},
            "out_proj": _dense(sd, f"{b}.attn.out_proj"),
            "fc1": _dense(sd, f"{b}.mlp.c_fc"),
            "fc2": _dense(sd, f"{b}.mlp.c_proj"),
        }
    return p


def import_clip_teacher(sd: Dict[str, np.ndarray],
                        clip_config) -> Dict[str, Any]:
    """Released OpenAI CLIP checkpoint → models.teachers.CLIPTeacher params
    (visual tower + visual.proj; reference models/vqkd_teacher/clip/clip.py:93
    load path — the text tower is dropped, only encode_image matters for
    VQ-KD regression targets)."""
    vis = strip_prefix(sd, "visual.")
    return {"visual": import_openai_clip_visual(vis, clip_config),
            "proj": vis["proj"]}


def import_dino_teacher(sd: Dict[str, np.ndarray],
                        config) -> Dict[str, Any]:
    """DINO ViT-B/16 checkpoint (timm ViT naming, reference
    models/vqkd_teacher/dino.py:299 hub weights) →
    models.teachers.DINOTeacher params. The fused qkv bias is split into our
    q_bias/v_bias; the k-bias is dropped — exactly equivalent, since a
    constant added to every key shifts each query's scores uniformly and
    softmax is shift-invariant."""
    if any(k.startswith("module.") for k in sd):
        sd = strip_prefix(sd, "module.")
    from ..ops.patch_embed import patchify_kernel_from_conv

    p: Dict[str, Any] = {
        "patch_embed_kernel": np.asarray(patchify_kernel_from_conv(
            jnp.asarray(sd["patch_embed.proj.weight"]))),
        "patch_embed_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"],
        "pos_embed": interpolate_abs_pos_embed(sd["pos_embed"],
                                               config.num_patches),
    }
    C = config.embed_dim
    for i in range(config.depth):
        b = f"blocks.{i}"
        bias = sd[f"{b}.attn.qkv.bias"]
        p[f"block_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
            "attn": {
                "qkv": {"kernel": sd[f"{b}.attn.qkv.weight"].T},
                "q_bias": bias[:C],
                "v_bias": bias[2 * C:],
                "proj": _dense(sd, f"{b}.attn.proj"),
            },
        }
    if "norm.weight" in sd:
        p["final_norm"] = _ln(sd, "norm")
    return {"backbone": p}


# ---------------------------------------------------------------------------
# Swin import (Microsoft Swin naming; reference models/xfm.py:173-205)

def import_swin(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    if "model" in sd:
        sd = sd["model"]
    from ..ops.patch_embed import patchify_kernel_from_conv
    from ..models.swin import SwinConfig  # noqa: F401 (typing aid)

    p: Dict[str, Any] = {
        "patch_embed": {"kernel": np.asarray(patchify_kernel_from_conv(
            jnp.asarray(sd["patch_embed.proj.weight"]))),
            "bias": sd["patch_embed.proj.bias"]},
        "patch_norm": _ln(sd, "patch_embed.norm"),
        "norm": _ln(sd, "norm"),
    }
    ws = config.window_size
    dst_num = (2 * ws - 1) ** 2
    for si, depth in enumerate(config.depths):
        for bi in range(depth):
            b = f"layers.{si}.blocks.{bi}"
            table = sd[f"{b}.attn.relative_position_bias_table"]
            if table.shape[0] != dst_num:
                table = _interp_swin_table(table, dst_num)
            p[f"stage{si}_block{bi}"] = {
                "norm1": _ln(sd, f"{b}.norm1"),
                "norm2": _ln(sd, f"{b}.norm2"),
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
                "relative_position_bias_table": table,
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            }
        if si < len(config.depths) - 1:
            d = f"layers.{si}.downsample"
            p[f"merge{si}"] = {
                "norm": _ln(sd, f"{d}.norm"),
                "reduction": {"kernel": sd[f"{d}.reduction.weight"].T},
            }
    return p


def _interp_swin_table(table: np.ndarray, dst_num: int) -> np.ndarray:
    """Bicubic resize of a Swin rel-pos table across window sizes
    (reference models/swin_transformer.py:595 interpolate_relative_pos_embed)."""
    src = int(round(table.shape[0] ** 0.5))
    dst = int(round(dst_num ** 0.5))
    h = table.shape[1]
    grid = jnp.asarray(table.reshape(1, src, src, h), jnp.float32)
    out = jax.image.resize(grid, (1, dst, dst, h), method="cubic")
    return np.asarray(out).reshape(dst_num, h)


# ---------------------------------------------------------------------------
# MLP heads built with nn.Sequential in torch (reference models/xfm.py:115-121)

def import_mlp_head(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "fc1": _dense(sd, f"{prefix}.0"),
        "ln": _ln(sd, f"{prefix}.1"),
        "fc2": _dense(sd, f"{prefix}.3"),
    }


def import_deep_mlp_head(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """6-Linear Sequential (reference models/model_classification.py:38-53):
    indices 0,3,6,9 are Linear+LN pairs, 12 the output Linear."""
    out: Dict[str, Any] = {}
    for j, idx in enumerate((0, 3, 6, 9)):
        out[f"fc{j}"] = _dense(sd, f"{prefix}.{idx}")
        out[f"ln{j}"] = _ln(sd, f"{prefix}.{idx + 1}")
    out["out"] = _dense(sd, f"{prefix}.12")
    return out


# ---------------------------------------------------------------------------
# full XFM checkpoint

def import_xfm_checkpoint(sd: Dict[str, np.ndarray], xfm_config,
                          head: str | None = None) -> Dict[str, Any]:
    """Map a reference XFM state dict (e.g. xfm_1b3.th) onto the XFMBase
    param tree. `sd` keys look like `vision_encoder.blocks.0...`,
    `text_encoder.roberta.embeddings...`, `fusion_encoder.roberta...`,
    `vision_proj.weight`, `temp`, `itm_head.0.weight`
    (reference models/xfm.py:471-539 module layout)."""
    c = xfm_config
    backbone: Dict[str, Any] = {}

    vis_sd = strip_prefix(sd, "vision_encoder.")
    if vis_sd:
        kind = getattr(c, "vision_backbone", "beit2")
        if kind == "clip_vit":
            backbone["vision_encoder"] = import_clip_vit(vis_sd, c.vision)
        elif kind == "swin":
            backbone["vision_encoder"] = import_swin(vis_sd, c.vision)
        else:
            backbone["vision_encoder"] = import_beit2(vis_sd, c.vision)

    for name, cfg, with_mlm in (("text_encoder", c.text, c.use_mlm_loss),
                                ("fusion_encoder", c.fusion, True)):
        sub = strip_prefix(sd, f"{name}.roberta.")
        lm = {k: v for k, v in sd.items()
              if k.startswith(f"{name}.lm_head.")}
        sub.update({k[len(name) + 1:]: v for k, v in lm.items()})
        if not sub:
            sub = strip_prefix(sd, f"{name}.bert.")
            cls = {k[len(name) + 1:]: v for k, v in sd.items()
                   if k.startswith(f"{name}.cls.")}
            sub.update(cls)
        if sub:
            backbone[name] = import_text_encoder(sub, cfg, with_mlm=with_mlm)

    if "vision_proj.weight" in sd:
        backbone["vision_proj"] = _dense(sd, "vision_proj")
        backbone["text_proj"] = _dense(sd, "text_proj")
    if "temp" in sd and c.learnable_temp and c.use_contrastive_loss:
        backbone["temp"] = sd["temp"].reshape(())
    if "itm_head.0.weight" in sd and c.use_matching_loss:
        backbone["itm_head"] = import_mlp_head(sd, "itm_head")
    if "bbox_head.0.weight" in sd and c.use_bbox_loss:
        backbone["bbox_head"] = import_mlp_head(sd, "bbox_head")
    if "fusion_proj.weight" in sd:
        backbone["fusion_proj"] = _dense(sd, "fusion_proj")
    if "lm_head.weight" in sd and getattr(c, "use_vision_tokenizer", False):
        # MIM code-prediction head under the VQ-KD path
        # (reference models/xfm.py:111 `self.lm_head`)
        backbone["mim_lm_head"] = _dense(sd, "lm_head")

    params: Dict[str, Any] = {"backbone": backbone}
    if head == "cls_mlp" and "cls_head.0.weight" in sd:
        params["cls_head"] = import_mlp_head(sd, "cls_head")
    elif head == "cls_deep" and "cls_head.0.weight" in sd:
        params["cls_head"] = import_deep_mlp_head(sd, "cls_head")
    return params


def import_vqkd_checkpoint(sd: Dict[str, np.ndarray],
                           vqkd_config) -> Dict[str, Any]:
    """Torch VQ-KD tokenizer checkpoint → flax variable trees
    {'params': ..., 'vq_stats': ...} for xfm_tpu.models.vqkd.VQKD used as a
    frozen MIM tokenizer. Mirrors the reference as_tokenzer load path
    (reference models/model_vqkd.py:274-290: teacher/scaling/loss keys
    dropped; encoder + encode_task_layer + quantizer retained — the decoder
    is unused for tokenization and left at init here)."""
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("teacher", "scaling", "loss"))}
    enc_sd = strip_prefix(sd, "encoder.")
    params: Dict[str, Any] = {
        "encoder": import_beit2(enc_sd, vqkd_config.encoder),
        # nn.Sequential(Linear, Tanh, Linear) → encode_task_layer.0/.2
        # (reference models/model_vqkd.py:86-89)
        "encode_task_layer_0": _dense(sd, "encode_task_layer.0"),
        "encode_task_layer_1": _dense(sd, "encode_task_layer.2"),
    }
    vq_stats = {"quantize": {
        "codebook": sd["quantize.embedding.weight"],
        "cluster_size": sd["quantize.embedding.cluster_size"],
    }}
    return {"params": params, "vq_stats": vq_stats}


def to_jax(tree):
    return jax.tree.map(lambda x: jnp.asarray(x), tree)


def merge_params(init_params, imported):
    """Overlay imported params onto a freshly-initialized tree (strict=False
    load semantics, reference models/xfm.py:554-557). Returns (params,
    missing, loaded) where missing lists init-only paths."""
    import flax

    flat_init = flax.traverse_util.flatten_dict(init_params, sep="/")
    flat_imp = flax.traverse_util.flatten_dict(imported, sep="/")
    missing = [k for k in flat_init if k not in flat_imp]
    unexpected = [k for k in flat_imp if k not in flat_init]
    merged = dict(flat_init)
    for k, v in flat_imp.items():
        if k in flat_init:
            tgt = flat_init[k]
            arr = jnp.asarray(v, dtype=tgt.dtype)
            if arr.shape != tgt.shape:
                # only squeeze/unsqueeze-style differences may be reshaped
                # ([1,1,C] vs [C]); an equal-element-count reinterpretation
                # (e.g. an untransposed [768,3072] into [3072,768]) would
                # load row-major garbage with no error
                def _sq(s):
                    return tuple(d for d in s if d != 1)

                if _sq(arr.shape) != _sq(tgt.shape):
                    raise ValueError(
                        f"shape mismatch for {k!r}: imported {arr.shape} "
                        f"vs model {tgt.shape} — refusing to reinterpret")
                arr = arr.reshape(tgt.shape)
            merged[k] = arr
    return (flax.traverse_util.unflatten_dict(merged, sep="/"), missing,
            unexpected)


# ---------------------------------------------------------------------------
# reverse export: Flax param tree → reference-style torch state dict

def _t(x):
    return np.asarray(x, np.float32)


def export_text_encoder(p: Dict[str, Any], prefix: str,
                        num_layers: int) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    r = f"{prefix}.roberta"
    emb = p["embeddings"]
    sd[f"{r}.embeddings.word_embeddings.weight"] = _t(
        emb["word_embeddings"]["embedding"])
    sd[f"{r}.embeddings.position_embeddings.weight"] = _t(
        emb["position_embeddings"]["embedding"])
    sd[f"{r}.embeddings.token_type_embeddings.weight"] = _t(
        emb["token_type_embeddings"]["embedding"])
    sd[f"{r}.embeddings.LayerNorm.weight"] = _t(emb["LayerNorm"]["scale"])
    sd[f"{r}.embeddings.LayerNorm.bias"] = _t(emb["LayerNorm"]["bias"])

    def dense(dst, sub):
        sd[f"{dst}.weight"] = _t(sub["kernel"]).T
        sd[f"{dst}.bias"] = _t(sub["bias"])

    def ln(dst, sub):
        sd[f"{dst}.weight"] = _t(sub["scale"])
        sd[f"{dst}.bias"] = _t(sub["bias"])

    for i in range(num_layers):
        lp = p[f"layer_{i}"]
        b = f"{r}.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            dense(f"{b}.attention.self.{qkv}", lp["attention"][qkv])
        dense(f"{b}.attention.output.dense", lp["attention"]["attn_out"])
        ln(f"{b}.attention.output.LayerNorm",
           lp["attention"]["output_LayerNorm"])
        if "crossattention" in lp:
            for qkv in ("query", "key", "value"):
                dense(f"{b}.crossattention.self.{qkv}",
                      lp["crossattention"][qkv])
            dense(f"{b}.crossattention.output.dense",
                  lp["crossattention"]["attn_out"])
            ln(f"{b}.crossattention.output.LayerNorm",
               lp["crossattention"]["output_LayerNorm"])
        dense(f"{b}.intermediate.dense", lp["intermediate_dense"])
        dense(f"{b}.output.dense", lp["output_dense"])
        ln(f"{b}.output.LayerNorm", lp["ffn_LayerNorm"])
    if "mlm_head" in p:
        dense(f"{prefix}.lm_head.dense", p["mlm_head"]["dense"])
        ln(f"{prefix}.lm_head.layer_norm", p["mlm_head"]["layer_norm"])
        sd[f"{prefix}.lm_head.bias"] = _t(p["mlm_head"]["bias"])
        # tied decoder weight (HF convention)
        sd[f"{prefix}.lm_head.decoder.weight"] = sd[
            f"{r}.embeddings.word_embeddings.weight"]
        sd[f"{prefix}.lm_head.decoder.bias"] = _t(p["mlm_head"]["bias"])
    return sd


def export_beit2(p: Dict[str, Any], depth: int) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    kernel = _t(p["patch_embed_kernel"])   # [P*P*C, D]
    ppc, D = kernel.shape
    P = int(round((ppc // 3) ** 0.5))
    w = kernel.reshape(P, P, 3, D).transpose(3, 2, 0, 1)  # OIHW
    sd["vision_encoder.patch_embed.proj.weight"] = w
    sd["vision_encoder.patch_embed.proj.bias"] = _t(p["patch_embed_bias"])
    sd["vision_encoder.cls_token"] = _t(p["cls_token"])
    sd["vision_encoder.mask_token"] = _t(p["mask_token"])
    for i in range(depth):
        bp = p[f"block_{i}"]
        b = f"vision_encoder.blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = _t(bp[nm]["scale"])
            sd[f"{b}.{nm}.bias"] = _t(bp[nm]["bias"])
        if "gamma_1" in bp:
            sd[f"{b}.gamma_1"] = _t(bp["gamma_1"])
            sd[f"{b}.gamma_2"] = _t(bp["gamma_2"])
        sd[f"{b}.attn.qkv.weight"] = _t(bp["attn"]["qkv"]["kernel"]).T
        sd[f"{b}.attn.q_bias"] = _t(bp["attn"]["q_bias"])
        sd[f"{b}.attn.v_bias"] = _t(bp["attn"]["v_bias"])
        sd[f"{b}.attn.proj.weight"] = _t(bp["attn"]["proj"]["kernel"]).T
        sd[f"{b}.attn.proj.bias"] = _t(bp["attn"]["proj"]["bias"])
        sd[f"{b}.attn.relative_position_bias_table"] = _t(
            bp["attn"]["relative_position_bias_table"])
        sd[f"{b}.mlp.fc1.weight"] = _t(bp["fc1"]["kernel"]).T
        sd[f"{b}.mlp.fc1.bias"] = _t(bp["fc1"]["bias"])
        sd[f"{b}.mlp.fc2.weight"] = _t(bp["fc2"]["kernel"]).T
        sd[f"{b}.mlp.fc2.bias"] = _t(bp["fc2"]["bias"])
    if "fc_norm" in p:
        sd["vision_encoder.fc_norm.weight"] = _t(p["fc_norm"]["scale"])
        sd["vision_encoder.fc_norm.bias"] = _t(p["fc_norm"]["bias"])
    return sd


def export_mlp_head(p: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.0.weight": _t(p["fc1"]["kernel"]).T,
        f"{prefix}.0.bias": _t(p["fc1"]["bias"]),
        f"{prefix}.1.weight": _t(p["ln"]["scale"]),
        f"{prefix}.1.bias": _t(p["ln"]["bias"]),
        f"{prefix}.3.weight": _t(p["fc2"]["kernel"]).T,
        f"{prefix}.3.bias": _t(p["fc2"]["bias"]),
    }


def export_xfm_checkpoint(params: Dict[str, Any],
                          xfm_config) -> Dict[str, np.ndarray]:
    """Inverse of import_xfm_checkpoint: our param tree → reference-style
    torch state dict (numpy values; `save_torch_checkpoint` writes .th)."""
    bb = params["backbone"] if "backbone" in params else params
    sd: Dict[str, np.ndarray] = {}
    if "vision_encoder" in bb:
        sd.update(export_beit2(bb["vision_encoder"],
                               xfm_config.vision.depth))
    if "text_encoder" in bb:
        sd.update(export_text_encoder(bb["text_encoder"], "text_encoder",
                                      xfm_config.text.num_hidden_layers))
    if "fusion_encoder" in bb:
        sd.update(export_text_encoder(bb["fusion_encoder"],
                                      "fusion_encoder",
                                      xfm_config.fusion.num_hidden_layers))
    for name in ("vision_proj", "text_proj", "fusion_proj"):
        if name in bb:
            sd[f"{name}.weight"] = _t(bb[name]["kernel"]).T
            sd[f"{name}.bias"] = _t(bb[name]["bias"])
    if "temp" in bb:
        sd["temp"] = _t(bb["temp"]).reshape(())
    for head in ("itm_head", "bbox_head"):
        if head in bb:
            sd.update(export_mlp_head(bb[head], head))
    if "cls_head" in params:
        sd.update(export_mlp_head(params["cls_head"], "cls_head"))
    return sd


def save_torch_checkpoint(path: str, sd: Dict[str, np.ndarray]) -> None:
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# Orbax native checkpoints (reference utils/checkpointer.py equivalent)

# Async checkpointing: managers are cached per directory so a background
# save owns a live manager for its whole write. The reference's torch.save
# blocks the train loop for the full serialize+write (utils/checkpointer.py:
# 28-47); on TPU the step cadence only needs to pay the device->host gather.
_MANAGERS: dict = {}


def _manager(ckpt_dir: str, keep: int):
    import orbax.checkpoint as ocp

    mngr = _MANAGERS.get(ckpt_dir)
    if mngr is None:
        mngr = ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=True))
        _MANAGERS[ckpt_dir] = mngr
    return mngr


def wait_for_checkpoints(ckpt_dir: str | None = None):
    """Block until pending async saves finish (one dir, or all)."""
    for d, m in list(_MANAGERS.items()):
        if ckpt_dir is None or d == os.path.abspath(ckpt_dir):
            m.wait_until_finished()


def save_checkpoint(ckpt_dir: str, state, step: int | None = None,
                    keep: int = 3, block: bool = True):
    """block=False returns while the filesystem write continues in the
    background (orbax async checkpointing); call wait_for_checkpoints() or a
    later block=True save before reading the step back or exiting."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    mngr = _manager(ckpt_dir, keep)
    step = int(step if step is not None else state.step)
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    mngr.save(step, args=ocp.args.StandardSave(payload))
    if block:
        mngr.wait_until_finished()
    return ckpt_dir


def load_params_from_checkpoint(ckpt_dir: str, step: int | None = None):
    """Params-only restore from an Orbax checkpoint dir (raw tree, no state
    template) — used for stage hand-offs where the next stage has a
    different optimizer/head structure (e.g. refcoco_bbox domain-pretrain →
    fine-tune, reference run.py:311-318)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    wait_for_checkpoints(ckpt_dir)  # flush pending async saves
    mngr = _MANAGERS.get(ckpt_dir) or ocp.CheckpointManager(ckpt_dir)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mngr.restore(step)
    return restored["params"]


def restore_checkpoint(ckpt_dir: str, state, step: int | None = None):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    wait_for_checkpoints(ckpt_dir)  # flush pending async saves
    mngr = _MANAGERS.get(ckpt_dir) or ocp.CheckpointManager(ckpt_dir)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        return state
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    restored = mngr.restore(step, args=ocp.args.StandardRestore(payload))
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])
