"""GradCAM weakly-supervised grounding (reference Grounding.py:76-126).

The reference registers forward/backward hooks on the fusion cross-attention
(reference models/xbert.py:247-259 save_attention) and computes
cam = attention × relu(grad) masked by text tokens, meaned over heads and
question tokens; detector boxes are ranked by cam mass inside each box
(reference dataset/utils.py:178-223).

JAX formulation: a multiplicative `prob_gate` (ones) on the target layer's
cross-attention probabilities; d(score)/d(gate) = attn ⊙ grad_attn, so
cam = relu(grad_wrt_gate) — one jax.grad, no hooks, jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def itm_gradcam(model, params, images, text_ids, text_atts,
                block_num: int = 8):
    """→ cam [B, num_patches]: per-patch relevance of the ITM-positive score
    at fusion layer `block_num` (reference Grounding.py `block_num`).
    `model` is an XFMForRetrieval(-like) module with backbone + itm_head."""

    def encode(m, images, text_ids, text_atts):
        bb = m.backbone
        image_embeds = bb.get_vision_embeds(images)
        text_embeds = bb.get_text_embeds(text_ids, text_atts)
        return image_embeds, text_embeds

    image_embeds, text_embeds = model.apply(
        {"params": params}, images, text_ids, text_atts, method=encode)

    B = text_ids.shape[0]
    H = model.config.fusion.num_attention_heads
    Nq = text_ids.shape[1]
    Nk = image_embeds.shape[1]
    gate = jnp.ones((B, H, Nq, Nk), jnp.float32)

    def score(m, gate, image_embeds, text_embeds, text_atts):
        bb = m.backbone
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        cross = bb.fusion_encoder(
            inputs_embeds=text_embeds, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            cross_gate=gate, cross_gate_layer=block_num)
        logits = bb.itm_head(cross[:, 0, :])
        return jnp.sum(logits[:, 1])

    def f(gate):
        return model.apply({"params": params}, gate, image_embeds,
                           text_embeds, text_atts, method=score)

    grads = jax.grad(f)(gate)                       # = attn ⊙ dscore/dattn
    cam = jnp.maximum(grads, 0.0)                   # [B, H, Nq, Nk]
    # mask to valid text tokens, mean over heads and tokens, drop cls slot
    tmask = text_atts.astype(jnp.float32)[:, None, :, None]
    cam = jnp.sum(cam * tmask, axis=2) / jnp.maximum(
        jnp.sum(tmask, axis=2), 1.0)
    cam = jnp.mean(cam, axis=1)                     # [B, Nk]
    return cam[:, 1:]                               # patches only


def rank_boxes_by_cam(cam_patch, boxes, image_res: int, patch_size: int):
    """Score detector boxes by mean cam mass inside each
    (reference dataset/utils.py:178-223). cam_patch: [num_patches];
    boxes: [N,4] xyxy in pixels. → box scores [N]."""
    import numpy as np

    G = image_res // patch_size
    cam = np.asarray(cam_patch).reshape(G, G)
    scores = []
    for (x0, y0, x1, y1) in np.asarray(boxes):
        i0, i1 = int(y0) // patch_size, max(int(y1) // patch_size, 1)
        j0, j1 = int(x0) // patch_size, max(int(x1) // patch_size, 1)
        i1 = min(max(i1, i0 + 1), G)
        j1 = min(max(j1, j0 + 1), G)
        scores.append(float(cam[i0:i1, j0:j1].mean()))
    return np.asarray(scores)
