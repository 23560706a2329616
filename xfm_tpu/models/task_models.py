"""Task-head models composing XFMBase (reference models/model_*.py).

Each is a Flax module with a `loss(...)` entry used by the jitted train step
and a `predict(...)` entry for evaluation. Unlike the reference's subclassing
(e.g. `XFMForRetrieval(XFMBase)`), heads *contain* an XFMBase — composition
keeps the param tree layout identical across tasks (everything under
`backbone/`), which is what makes one checkpoint loadable everywhere.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .text_encoder import cross_entropy
from .xfm import MLPHead, XFMBase, XFMConfig


class DeepMLPHead(nn.Module):
    """6-layer GELU MLP for ImageNet / linear probes
    (reference models/model_classification.py:38-53)."""
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1] // 2  # input is [cls ‖ mean-patch] = 2*feature_dim
        widths = [d * 4, d * 8, d * 4, d * 2]
        for i, w in enumerate(widths):
            x = nn.Dense(w, name=f"fc{i}", dtype=self.dtype)(x)
            x = nn.LayerNorm(name=f"ln{i}", dtype=self.dtype)(x)
            x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, name="out", dtype=self.dtype)(x)


class XFMForPretrain(nn.Module):
    """Pretraining head (reference models/model_pretrain.py:13-115).

    One call computes the losses of one stream batch; the train step sums
    weighted per-stream losses. The MIM mask arrives as `image_mask`
    ([B, num_patches] bool, generated host-side by
    data.block_masking.MaskingGenerator — reference models/beit2.py:431-441
    generates it inside forward; here the module stays pure).
    """
    config: XFMConfig

    def setup(self):
        self.backbone = XFMBase(self.config)

    def init_all(self, images, text_ids, text_atts):
        return self.backbone.init_all(images, text_ids, text_atts)

    def __call__(self, images, text_ids, text_atts, text_ids_masked=None,
                 masked_pos=None, masked_ids=None, image_mask=None,
                 idx_to_group_img=None, image_atts=None, target_bbox=None,
                 is_image=None, ret_itc=True, ret_match=True, ret_mlm=True,
                 ret_mim=False, ret_bbox=False, ret_bbox_giou=None,
                 data_source=None, vqkd_code_ids=None, deterministic=True):
        return self.loss(images, text_ids, text_atts, text_ids_masked,
                         masked_pos, masked_ids, image_mask,
                         idx_to_group_img, image_atts, target_bbox, is_image,
                         ret_itc, ret_match, ret_mlm, ret_mim, ret_bbox,
                         ret_bbox_giou, data_source, vqkd_code_ids,
                         deterministic)

    def loss(self, images, text_ids, text_atts, text_ids_masked=None,
             masked_pos=None, masked_ids=None, image_mask=None,
             idx_to_group_img=None, image_atts=None, target_bbox=None,
             is_image=None, ret_itc=True, ret_match=True, ret_mlm=True,
             ret_mim=False, ret_bbox=False, ret_bbox_giou=None,
             data_source=None, vqkd_code_ids=None, deterministic=True):
        bb = self.backbone
        out = {}
        zero = jnp.asarray(0.0, jnp.float32)

        if images is None:
            # text-only MLM stream (reference models/model_pretrain.py:93-98)
            out["loss_mlm"] = bb.get_mlm_loss(
                text_ids_masked, text_atts, masked_pos, masked_ids,
                deterministic=deterministic)
            for k in ("loss_itc", "loss_itm", "loss_mim", "loss_bbox",
                      "loss_giou"):
                out[k] = zero
            return out

        image_embeds_masked = None
        if ret_bbox:
            image_embeds, image_embeds_fullatts = bb.get_vision_embeds(
                images, idx_to_group_img=idx_to_group_img,
                image_atts=image_atts, deterministic=deterministic)
        else:
            if ret_mim and image_mask is not None:
                # one fused 2B vision pass instead of two B passes
                image_embeds, image_embeds_masked = \
                    bb.get_vision_embeds_pair(images, image_mask,
                                              deterministic=deterministic)
            else:
                image_embeds = bb.get_vision_embeds(
                    images, deterministic=deterministic)
            image_embeds_fullatts = None
            image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)

        is_imagenet = data_source == "imagenet"
        if not is_imagenet:
            text_embeds = bb.get_text_embeds(text_ids, text_atts,
                                             deterministic)
            image_feat, text_feat = bb.get_features(image_embeds, text_embeds)

        out["loss_itc"] = (bb.get_contrastive_loss(image_feat, text_feat)
                           if ret_itc and not is_imagenet else zero)
        # default ON: one 4B-row fusion pass for ITM+MLM with image k/v
        # projected once per unique image — measured 248.5 vs 243.7
        # samples/s over the separate passes at B=48 (PERF.md)
        fuse_fusion = (os.environ.get("XFM_FUSE_FUSION", "1") == "1"
                       and ret_match and ret_mlm and not is_imagenet
                       and text_ids_masked is not None)
        if fuse_fusion:
            # one 4B-row fusion pass for ITM + fusion-MLM (loss-identical to
            # the separate passes below; better MXU fill)
            rng = self.make_rng("hardneg")
            out["loss_itm"], out["loss_mlm"] = \
                bb.get_matching_and_fuse_mlm_loss(
                    rng, image_embeds, image_atts, image_feat, text_ids,
                    text_atts, text_feat, text_embeds, text_ids_masked,
                    masked_pos, masked_ids, deterministic=deterministic)
        elif ret_match and not is_imagenet:
            rng = self.make_rng("hardneg")
            out["loss_itm"] = bb.get_matching_loss(
                rng, image_embeds, image_atts, image_feat, text_ids,
                text_atts, text_feat, text_embeds=text_embeds,
                is_pretrain=True, deterministic=deterministic)
        else:
            out["loss_itm"] = zero
        if not fuse_fusion:
            out["loss_mlm"] = (bb.get_fuse_mlm_loss(
                text_ids_masked, text_atts, image_embeds, image_atts,
                masked_pos, masked_ids, deterministic)
                if ret_mlm and not is_imagenet else zero)

        if ret_mim and not ret_bbox and image_mask is not None:
            # vqkd_code_ids ([B, num_patches] int, computed by the task from
            # the frozen tokenizer) selects the CE branch of get_mim_loss
            # (reference models/xfm.py:625-629)
            out["loss_mim"] = bb.get_mim_loss(image_embeds_masked,
                                              image_embeds, image_mask,
                                              vqkd_code_ids=vqkd_code_ids)
        else:
            out["loss_mim"] = zero

        # ret_bbox (reference ret_bbox_loss) gates the region-grouped vision
        # forward; ret_bbox_giou gates the loss compute itself (reference
        # models/model_pretrain.py:81-89 — shipped configs set both True,
        # default follows ret_bbox)
        giou_on = ret_bbox if ret_bbox_giou is None else ret_bbox_giou
        if ret_bbox and giou_on and target_bbox is not None:
            coords = bb.predict_bbox(image_embeds_fullatts, text_ids=None,
                                     text_atts=text_atts,
                                     text_embeds=text_embeds,
                                     is_pretrain=True,
                                     deterministic=deterministic)
            lb, lg = bb.get_bbox_loss(coords, target_bbox, is_image)
            out["loss_bbox"], out["loss_giou"] = lb, lg
        else:
            out["loss_bbox"], out["loss_giou"] = zero, zero
        return out


class XFMForRetrieval(nn.Module):
    """ITC + ITM fine-tune head (reference models/model_retrieval.py:11-36)."""
    config: XFMConfig

    def setup(self):
        self.backbone = XFMBase(self.config)

    def init_all(self, images, text_ids, text_atts):
        return self.backbone.init_all(images, text_ids, text_atts)

    def __call__(self, images, text_ids, text_atts, idx=None,
                 deterministic=True):
        bb = self.backbone
        image_embeds = bb.get_vision_embeds(images, deterministic=deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = bb.get_text_embeds(text_ids, text_atts, deterministic)
        image_feat, text_feat = bb.get_features(image_embeds, text_embeds)
        loss_itc = bb.get_contrastive_loss(image_feat, text_feat, idx=idx)
        rng = self.make_rng("hardneg")
        loss_itm = bb.get_matching_loss(
            rng, image_embeds, image_atts, image_feat, text_ids, text_atts,
            text_feat, idx=idx, text_embeds=text_embeds, is_pretrain=False,
            deterministic=deterministic)
        return loss_itc, loss_itm

    def encode_images(self, images, deterministic=True):
        """→ (image_embeds, image_feat): eval stage 1
        (reference Retrieval.py:118-130)."""
        bb = self.backbone
        image_embeds = bb.get_vision_embeds(images, deterministic=deterministic)
        return image_embeds, bb.get_features(image_embeds=image_embeds)

    def encode_texts(self, text_ids, text_atts, deterministic=True):
        bb = self.backbone
        text_embeds = bb.get_text_embeds(text_ids, text_atts, deterministic)
        return text_embeds, bb.get_features(text_embeds=text_embeds)

    def itm_scores(self, image_embeds, text_embeds, text_atts,
                   deterministic=True, image_row_idx=None,
                   image_group_size=None):
        """ITM rerank logit[:, 1] for eval stage 2
        (reference Retrieval.py:141-152).

        `image_row_idx` ([rows] int): image_embeds holds only the UNIQUE
        images and each scored row gathers its image by index — the fusion
        layers project cross k/v once per unique image instead of once per
        (image × candidate) pair (measured 2× SLOWER at 577 image tokens:
        the per-layer gathered-k/v materialization dominates, PERF.md r4).

        `image_group_size` (static int): the grouped-batch formulation —
        image_embeds holds the U unique images and text rows come in
        contiguous runs of `image_group_size` candidates per image (the
        i2t rerank shape). Cross-attention views the queries per unique
        image, so the k/v are neither recomputed per candidate (the repeat
        formulation's 256× redundant projections) nor gathered per layer
        (the row-idx formulation's 1.8 GB/layer materialization) — see
        PERF.md round-5 for the measured verdict."""
        bb = self.backbone
        if image_group_size is not None:
            nrows = image_embeds.shape[0]
        elif image_row_idx is not None:
            nrows = image_row_idx.shape[0]
        else:
            nrows = image_embeds.shape[0]
        image_atts = jnp.ones((nrows, image_embeds.shape[1]), jnp.int32)
        cross = bb.get_cross_embeds(image_embeds, image_atts,
                                    text_embeds=text_embeds,
                                    text_atts=text_atts, is_pretrain=False,
                                    deterministic=deterministic,
                                    image_row_idx=image_row_idx,
                                    image_group_size=image_group_size)[:, 0, :]
        return bb.itm_head(cross)[:, 1]


class XFMForNLVR(nn.Module):
    """Two-image reasoning head (reference models/model_nlvr.py:16-44):
    images are concat-batched [2B,...], split, two fusion passes, cls concat
    → 2-way MLP."""
    config: XFMConfig

    def setup(self):
        self.backbone = XFMBase(self.config)
        self.cls_head = MLPHead(2, dtype=self.config.dtype)

    def init_all(self, images, text_ids, text_atts):
        # images arrive concat-batched [2B, ...]; init on the first half so
        # batch dims line up inside the fusion pass.
        n = text_ids.shape[0]
        _, _, cross = self.backbone.init_all(images[:n], text_ids, text_atts)
        cls2 = jnp.concatenate([cross[:, 0, :], cross[:, 0, :]], axis=-1)
        return self.cls_head(cls2)

    def __call__(self, images, text_ids, text_atts, targets=None, train=True,
                 deterministic=True):
        bb = self.backbone
        image_embeds = bb.get_vision_embeds(images, deterministic=deterministic)
        text_embeds = bb.get_text_embeds(text_ids, text_atts, deterministic)
        n = text_ids.shape[0]
        img0, img1 = image_embeds[:n], image_embeds[n:]
        atts = jnp.ones(img0.shape[:2], jnp.int32)
        cls0 = bb.get_cross_embeds(img0, atts, text_embeds=text_embeds,
                                   text_atts=text_atts, is_pretrain=False,
                                   deterministic=deterministic)[:, 0, :]
        cls1 = bb.get_cross_embeds(img1, atts, text_embeds=text_embeds,
                                   text_atts=text_atts, is_pretrain=False,
                                   deterministic=deterministic)[:, 0, :]
        pred = self.cls_head(jnp.concatenate([cls0, cls1], axis=-1))
        if not train:
            return pred
        return cross_entropy(pred, targets)


class XFMForClassification(nn.Module):
    """GLUE / ImageNet / linear-probe head
    (reference models/model_classification.py:17-96): text-only cls,
    image-only [cls ‖ mean-patch] → deep MLP, or fused cls; MSE when
    num_labels == 1 (STS-B regression)."""
    config: XFMConfig
    num_labels: int = 2
    task_name: str = "glue"   # glue | imagenet | fused
    is_lp: bool = False       # frozen-backbone linear probe

    def setup(self):
        self.backbone = XFMBase(self.config)
        if self.task_name == "imagenet" or self.is_lp:
            self.cls_head = DeepMLPHead(self.num_labels,
                                        dtype=self.config.dtype)
        else:
            self.cls_head = MLPHead(self.num_labels, dtype=self.config.dtype)

    def init_all(self, images=None, text_ids=None, text_atts=None):
        if images is not None and text_ids is not None:
            self.backbone.init_all(images, text_ids, text_atts)
        return self.cls_head(self.features(images, text_ids, text_atts))

    def features(self, images=None, text_ids=None, text_atts=None,
                 deterministic=True):
        bb = self.backbone
        if images is None:
            hidden = bb.text_encoder(text_ids, attention_mask=text_atts,
                                     deterministic=deterministic)
            return hidden[:, 0, :]
        if text_ids is None:
            image_embeds = bb.get_vision_embeds(images,
                                                deterministic=deterministic)
            if self.is_lp:
                image_embeds = jax.lax.stop_gradient(image_embeds)
            cls = image_embeds[:, 0, :]
            mean = jnp.mean(image_embeds[:, 1:, :], axis=1)
            return jnp.concatenate([cls, mean], axis=-1)
        image_embeds = bb.get_vision_embeds(images, deterministic=deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = bb.get_text_embeds(text_ids, text_atts, deterministic)
        return bb.get_cross_embeds(image_embeds, image_atts,
                                   text_embeds=text_embeds,
                                   text_atts=text_atts, is_pretrain=False,
                                   deterministic=deterministic)[:, 0, :]

    def __call__(self, images=None, text_ids=None, text_atts=None,
                 targets=None, train=True, deterministic=True):
        feats = self.features(images, text_ids, text_atts, deterministic)
        pred = self.cls_head(feats)
        if not train:
            return pred
        if self.num_labels == 1:  # regression (STS-B)
            return jnp.mean((pred.reshape(-1).astype(jnp.float32)
                             - targets.reshape(-1).astype(jnp.float32)) ** 2)
        return cross_entropy(pred, targets)


class TextClassifier(nn.Module):
    """Text-only classifier ablation (reference
    models/model_classification.py:98-150 TextClassifier: a plain
    BERT/RoBERTa encoder + 2-layer MLP head, no vision/fusion towers —
    Classify.py `use_text_classifier`). Here the same TextTransformer
    engine runs in pure text mode; no vision parameters are created."""
    text_config: Any
    num_labels: int = 2

    def setup(self):
        from .text_encoder import TextTransformer

        self.text_encoder = TextTransformer(self.text_config)
        self.cls_head = MLPHead(self.num_labels,
                                dtype=self.text_config.dtype)

    def __call__(self, images=None, text_ids=None, text_atts=None,
                 targets=None, train=True, deterministic=True):
        hidden = self.text_encoder(text_ids, attention_mask=text_atts,
                                   deterministic=deterministic)
        pred = self.cls_head(hidden[:, 0, :])
        if not train:
            return pred
        return cross_entropy(pred, targets)

    def init_all(self, images=None, text_ids=None, text_atts=None):
        return self(text_ids=text_ids, text_atts=text_atts, train=False)


class XFMForGrounding(nn.Module):
    """RefCOCO bbox regression head (reference models/model_grounding.py)."""
    config: XFMConfig

    def setup(self):
        self.backbone = XFMBase(self.config)

    def init_all(self, images, text_ids, text_atts):
        return self.backbone.init_all(images, text_ids, text_atts)

    def __call__(self, images, text_ids, text_atts, target_bbox=None,
                 train=True, deterministic=True):
        bb = self.backbone
        image_embeds = bb.get_vision_embeds(images, deterministic=deterministic)
        text_embeds = bb.get_text_embeds(text_ids, text_atts, deterministic)
        coords = bb.predict_bbox(image_embeds, text_atts=text_atts,
                                 text_embeds=text_embeds, is_pretrain=False,
                                 deterministic=deterministic)
        if not train:
            return coords
        return bb.get_bbox_loss(coords, target_bbox)
