"""X-FM pretraining/fine-tuning losses as pure functions.

GSPMD redesign of reference models/xfm.py:624-854. The reference's
`AllGather` autograd trick (reference models/xfm.py:81-101) exists only
because DDP hands each rank a local batch; under pjit the batch is a single
global array sharded over the mesh, so the contrastive logits are written as
plain global matmuls and XLA inserts the all-gathers (over ICI) plus the
slice-backward automatically.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def contrastive_loss(image_feat: jnp.ndarray, text_feat: jnp.ndarray,
                     temp: jnp.ndarray,
                     idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ITC (reference models/xfm.py:683-715). Features already l2-normalized.

    idx-variant builds soft positive mass for duplicate images
    (reference models/xfm.py:705-713)."""
    logits = (image_feat @ text_feat.T).astype(jnp.float32) / temp
    n = logits.shape[0]
    if idx is None:
        labels = jnp.arange(n)
        li2t = _ce_logits(logits, labels)
        lt2i = _ce_logits(logits.T, labels)
    else:
        idx = idx.reshape(-1, 1)
        pos = (idx == idx.T).astype(jnp.float32)
        labels = pos / jnp.sum(pos, axis=1, keepdims=True)
        li2t = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits, -1) * labels, -1))
        lt2i = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits.T, -1) * labels, -1))
    return (li2t + lt2i) / 2


def _ce_logits(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def hard_negative_indices(rng: jax.Array, image_feat: jnp.ndarray,
                          text_feat: jnp.ndarray, temp: jnp.ndarray,
                          idx: Optional[jnp.ndarray] = None):
    """In-batch hard-negative sampling (reference models/xfm.py:717-746).

    The reference loops `torch.multinomial` per row on host; here a single
    vectorized `jax.random.categorical` over softmax-masked logits — fixed
    shapes, fully on device. Returns (image_neg_idx, text_neg_idx), each [B].
    """
    sim_i2t = jax.lax.stop_gradient(
        (image_feat @ text_feat.T).astype(jnp.float32) / temp)
    sim_t2i = sim_i2t.T
    n = sim_i2t.shape[0]
    if idx is None:
        mask = jnp.eye(n, dtype=bool)
    else:
        idx = idx.reshape(-1, 1)
        mask = idx == idx.T
    # weights = softmax(sim)+1e-5 with positives zeroed; categorical over
    # log-weights reproduces the multinomial draw.
    wi2t = jnp.where(mask, 0.0, jax.nn.softmax(sim_i2t, -1) + 1e-5)
    wt2i = jnp.where(mask, 0.0, jax.nn.softmax(sim_t2i, -1) + 1e-5)
    r1, r2 = jax.random.split(rng)
    text_neg = jax.random.categorical(r1, jnp.log(wi2t + 1e-30), axis=-1)
    image_neg = jax.random.categorical(r2, jnp.log(wt2i + 1e-30), axis=-1)
    return image_neg, text_neg


def matching_logits_labels(itm_scores_pos: jnp.ndarray,
                           itm_scores_neg: jnp.ndarray):
    """ITM labels: 1 for the B positives, 0 for the 2B negatives
    (reference models/xfm.py:797-800)."""
    n_pos = itm_scores_pos.shape[0]
    n_neg = itm_scores_neg.shape[0]
    logits = jnp.concatenate([itm_scores_pos, itm_scores_neg], axis=0)
    labels = jnp.concatenate([jnp.ones(n_pos, jnp.int32),
                              jnp.zeros(n_neg, jnp.int32)])
    return logits, labels


def mim_mse_loss(masked_embeds: jnp.ndarray, target_embeds: jnp.ndarray,
                 mask: jnp.ndarray, cls_too: bool = True) -> jnp.ndarray:
    """MIM feature-regression (reference models/xfm.py:630-635): MSE between
    masked-forward patch embeds and detached unmasked embeds at masked
    positions, plus cls MSE unless mim_cls_only. `mask`: [B, N] bool.

    torch indexes `x[:,1:,:][mask]` (dynamic count); here the masked mean is
    a weighted mean — identical value, static shape."""
    target = jax.lax.stop_gradient(target_embeds)
    diff2 = (masked_embeds[:, 1:, :] - target[:, 1:, :]) ** 2
    w = mask.astype(diff2.dtype)[..., None]
    masked_mse = jnp.sum(diff2 * w) / jnp.maximum(
        jnp.sum(w) * diff2.shape[-1], 1.0)
    if not cls_too:
        return masked_mse
    cls_mse = jnp.mean((masked_embeds[:, 0, :] - target[:, 0, :]) ** 2)
    return masked_mse + cls_mse


def mim_vqkd_loss(logits: jnp.ndarray, code_ids: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """MIM CE against frozen VQ-KD codebook indices at masked positions
    (reference models/xfm.py:625-629). logits: [B, N, codebook]; mask [B, N]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, code_ids[..., None], axis=-1)[..., 0]
    w = mask.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# bbox losses (reference models/box_ops.py, models/xfm.py:815-840)

def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_iou_union(b1: jnp.ndarray, b2: jnp.ndarray):
    """Elementwise (diagonal) IoU of xyxy boxes, [B,4]×[B,4] → [B]."""
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = jnp.maximum(b1[:, :2], b2[:, :2])
    rb = jnp.minimum(b1[:, 2:], b2[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = a1 + a2 - inter
    return inter / jnp.maximum(union, 1e-6), union


def generalized_box_iou_diag(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    iou, union = box_iou_union(b1, b2)
    lt = jnp.minimum(b1[:, :2], b2[:, :2])
    rb = jnp.maximum(b1[:, 2:], b2[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[:, 0] * wh[:, 1]
    return iou - (area - union) / jnp.maximum(area, 1e-6)


def bbox_loss(output_coord: jnp.ndarray, target_bbox: jnp.ndarray,
              is_image: Optional[jnp.ndarray] = None):
    """L1 + GIoU with degenerate-box guard (reference models/xfm.py:815-840).
    The torch guard zeroes the *whole batch* GIoU if any box degenerates;
    here the guard is per-sample (strictly better + jit-friendly)."""
    l1 = jnp.abs(output_coord - target_bbox)

    b1 = box_cxcywh_to_xyxy(output_coord)
    b2 = box_cxcywh_to_xyxy(target_bbox)
    degenerate = (jnp.any(b1[:, 2:] < b1[:, :2], axis=-1)
                  | jnp.any(b2[:, 2:] < b2[:, :2], axis=-1))
    giou = jnp.where(degenerate, 0.0, 1 - generalized_box_iou_diag(b1, b2))

    if is_image is None:
        num = output_coord.shape[0]
    else:
        keep = 1.0 - is_image.astype(l1.dtype)
        num = jnp.maximum(jnp.sum(keep), 1.0)
        l1 = l1 * keep[:, None]
        giou = giou * keep
    return jnp.sum(l1) / num, jnp.sum(giou) / num
