"""XFMBase — the three-encoder composite model (vision / text / fusion).

Flax re-architecture of reference models/xfm.py:471-854:
- vision encoder: BEiT-2 (default), CLIP-ViT, or Swin
  (reference models/xfm.py:124-255);
- text encoder: 12-layer RoBERTa-style TextTransformer, text-only
  (text_fusion_start_at == num layers ⇒ no cross-attn;
  reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml:76-79);
- fusion encoder: always a separate RobertaForMaskedLM-equivalent with
  fusion_layer=0 ⇒ cross-attention to image patches in every layer
  (reference models/xfm.py:527-534);
- ITC projections to embed_dim=256 + learnable temperature clamped to
  [min_temp, max_temp] (reference models/xfm.py:498-510,
  models/model_pretrain.py:35-37);
- itm_head / bbox_head two-layer GELU MLPs (reference models/xfm.py:115-121).

Task heads (pretrain/retrieval/nlvr/classification/vqa/captioning/grounding)
compose this module; see xfm_tpu.models.task_models.
"""
from __future__ import annotations

import os
import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import losses
from .beit2 import BeitVisionTransformer, VisionConfig
from .clip_vit import ClipVisionConfig, ClipVisionTransformer
from .text_encoder import TextConfig, TextTransformer, cross_entropy


class MLPHead(nn.Module):
    """Linear(d→2d) → LayerNorm → GELU → Linear(2d→out)
    (reference models/xfm.py:115-121)."""
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(d * 2, name="fc1", dtype=self.dtype)(x)
        x = nn.LayerNorm(name="ln", dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.output_dim, name="fc2", dtype=self.dtype)(x)
        return x


@dataclasses.dataclass(frozen=True)
class XFMConfig:
    vision: VisionConfig | ClipVisionConfig = VisionConfig()
    text: TextConfig = TextConfig.roberta_base()
    fusion: TextConfig = TextConfig.roberta_base(fusion_layer=0)
    vision_backbone: str = "beit2"   # beit2 | clip_vit | swin
    embed_dim: int = 256
    temp: float = 0.07
    learnable_temp: bool = True
    max_temp: float = 0.5
    min_temp: float = 0.001
    detach_text_forMLM: bool = True
    mim_cls_only: bool = False
    use_contrastive_loss: bool = False
    use_matching_loss: bool = False
    use_mlm_loss: bool = False
    use_bbox_loss: bool = False
    use_vision_tokenizer: bool = False
    codebook_size: int = 8192
    dtype: Any = jnp.float32

    @property
    def vision_width(self) -> int:
        if self.vision_backbone == "clip_vit":
            return self.vision.hidden_size
        if self.vision_backbone == "swin":
            return self.vision.num_features
        return self.vision.embed_dim

    @property
    def text_width(self) -> int:
        return self.text.hidden_size


def config_from_yaml(config: dict, *, use_contrastive_loss=False,
                     use_matching_loss=False, use_mlm_loss=False,
                     use_bbox_loss=False, dtype=None) -> XFMConfig:
    """Build XFMConfig from the reference YAML schema
    (mirrors reference models/xfm.py:124-255,258-405 builder logic).

    dtype=None resolves the COMPUTE dtype from the config's precision policy
    (core.precision.policy_from_config) — bf16 compute by default, matching
    the reference's apex O1 default for the same workloads
    (reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml:118). Params stay
    fp32 (flax param_dtype default)."""
    if dtype is None:
        from ..core.precision import policy_from_config

        dtype = policy_from_config(config).compute_dtype
    vision_cfg_json = config.get("_vision", {})
    image_res = config.get("image_res", 224)
    if config.get("use_clip_vit", False):
        vision = ClipVisionConfig(
            image_res=image_res,
            patch_size=config.get("patch_size", 16),
            hidden_size=vision_cfg_json.get("vision_width", 768),
            num_hidden_layers=vision_cfg_json.get("num_hidden_layers", 12),
            num_attention_heads=vision_cfg_json.get("num_attention_heads", 12),
            intermediate_size=vision_cfg_json.get("intermediate_size", 3072),
            hidden_act=vision_cfg_json.get("hidden_act", "quick_gelu"),
            local_attn_depth=vision_cfg_json.get(
                "local_attn_depth", config.get("local_attn_depth", 0)),
            dtype=dtype,
        )
        backbone = "clip_vit"
    elif config.get("use_deit", False):
        # Legacy plain-ViT path: unreachable in the reference (models/xfm.py:
        # 233-234 raises) but the backbone itself exists (models/vit.py) —
        # exposed here behind an explicit opt-in key.
        from .deit import DeitConfig

        vision = DeitConfig(
            image_res=image_res,
            patch_size=config.get("patch_size", 16),
            embed_dim=vision_cfg_json.get("vision_width", 768),
            depth=vision_cfg_json.get("num_hidden_layers", 12),
            num_heads=vision_cfg_json.get("num_attention_heads", 12),
            dtype=dtype)
        backbone = "deit"
    elif config.get("use_swin", False):
        from .swin import SwinConfig

        vision = SwinConfig(
            image_res=vision_cfg_json.get("image_res", image_res),
            patch_size=4,
            embed_dim=vision_cfg_json.get("embed_dim", 128),
            depths=tuple(vision_cfg_json.get("depths", (2, 2, 18, 2))),
            num_heads=tuple(vision_cfg_json.get("num_heads",
                                                (4, 8, 16, 32))),
            window_size=vision_cfg_json.get("window_size", 7),
            dtype=dtype)
        backbone = "swin"
    else:  # beit2 default (reference models/xfm.py:208-230)
        large = "large" in str(config.get("vision_config", "base"))
        base_kw = dict(image_res=image_res,
                       # reference hardcodes 0.1 (models/xfm.py:190); the YAML
                       # key is an xfm_tpu extension (ablation / bench use)
                       drop_path_rate=config.get("drop_path_rate", 0.1),
                       use_rel_pos_bias=True, use_abs_pos_emb=False,
                       init_values=0.1, qkv_bias=True,
                       use_mean_pooling=True, dtype=dtype,
                       hidden_act=config.get("hidden_act", "gelu"),
                       local_attn_depth=config.get("local_attn_depth", -1),
                       remat=config.get("gradient_checkpointing", False),
                       remat_policy=config.get("remat_policy", "full"))
        vision = (VisionConfig.beit_large(**base_kw) if large
                  else VisionConfig.beit_base(**base_kw))
        # explicit size overrides (debug/tiny configs)
        vkw = {}
        for src, dst in (("vision_embed_dim", "embed_dim"),
                         ("vision_depth", "depth"),
                         ("vision_num_heads", "num_heads"),
                         ("patch_size", "patch_size")):
            if config.get(src) is not None:
                vkw[dst] = config[src]
        if vkw:
            vision = dataclasses.replace(vision, **vkw)
        backbone = "beit2"

    is_roberta = "roberta" in str(config.get("text_encoder", "roberta-base"))
    mk = TextConfig.roberta_base if is_roberta else TextConfig.bert_base
    n_text = config.get("text_num_hidden_layers", 12)
    tkw = {"remat": config.get("gradient_checkpointing", False),
           "remat_policy": config.get("remat_policy", "full")}
    if config.get("hidden_act"):
        tkw["hidden_act"] = config["hidden_act"]
    # xfm_tpu extension: dropout-rate overrides (reference uses the HF
    # defaults, 0.1/0.1 — these keys exist for ablations and benchmarks)
    for k in ("hidden_dropout_prob", "attention_probs_dropout_prob"):
        if config.get(k) is not None:
            tkw[k] = float(config[k])
    for src, dst in (("text_hidden_size", "hidden_size"),
                     ("text_num_attention_heads", "num_attention_heads"),
                     ("text_intermediate_size", "intermediate_size"),
                     ("text_vocab_size", "vocab_size")):
        if config.get(src) is not None:
            tkw[dst] = config[src]
    if backbone == "clip_vit":
        vwidth = vision.hidden_size
    elif backbone == "swin":
        vwidth = vision.num_features
    else:
        vwidth = vision.embed_dim
    text = mk(num_hidden_layers=n_text,
              fusion_layer=config.get("text_fusion_start_at", n_text),
              encoder_width=vwidth, dtype=dtype, **tkw)
    fusion = mk(num_hidden_layers=config.get("fusion_num_hidden_layers", 12),
                fusion_layer=config.get("fusion_fusion_start_at", 0),
                encoder_width=text.encoder_width, dtype=dtype, **tkw)

    # Sequence parallelism (YAML `parallel: {seq_shard: true}` or top-level
    # `seq_shard: true`): Megatron-SP activation sharding between blocks —
    # beyond-reference capability, no-op without a tensor mesh axis.
    sp = bool((config.get("parallel", {}) or {}).get(
        "seq_shard", config.get("seq_shard", False)))
    if sp:
        if backbone == "beit2":
            vision = dataclasses.replace(vision, seq_shard=True)
        text = dataclasses.replace(text, seq_shard=True)
        fusion = dataclasses.replace(fusion, seq_shard=True)

    return XFMConfig(
        vision=vision, text=text, fusion=fusion, vision_backbone=backbone,
        embed_dim=config.get("embed_dim", 256),
        temp=config.get("temp", 0.07),
        learnable_temp=config.get("learnable_temp", True),
        max_temp=config.get("max_temp", 0.5),
        min_temp=config.get("min_temp", 0.001),
        detach_text_forMLM=config.get("detach_text_forMLM", True),
        mim_cls_only=config.get("mim_cls_only", False),
        use_contrastive_loss=use_contrastive_loss,
        use_matching_loss=use_matching_loss,
        use_mlm_loss=use_mlm_loss,
        use_bbox_loss=use_bbox_loss,
        use_vision_tokenizer=config.get("use_vision_tokenizer", False),
        codebook_size=config.get("codebook_size", 8192),
        dtype=dtype,
    )


class XFMBase(nn.Module):
    config: XFMConfig

    def setup(self):
        c = self.config
        if c.vision_backbone == "clip_vit":
            self.vision_encoder = ClipVisionTransformer(c.vision)
        elif c.vision_backbone == "swin":
            from .swin import SwinTransformer

            self.vision_encoder = SwinTransformer(c.vision)
        elif c.vision_backbone == "deit":
            from .deit import DeitVisionTransformer

            self.vision_encoder = DeitVisionTransformer(c.vision)
        else:
            self.vision_encoder = BeitVisionTransformer(c.vision)
        self.text_encoder = TextTransformer(c.text, with_mlm=c.use_mlm_loss)
        self.fusion_encoder = TextTransformer(c.fusion, with_mlm=True)

        if c.use_contrastive_loss:
            self.vision_proj = nn.Dense(c.embed_dim, dtype=c.dtype)
            self.text_proj = nn.Dense(c.embed_dim, dtype=c.dtype)
            if c.learnable_temp:
                self.temp = self.param(
                    "temp", nn.initializers.constant(c.temp), ())
        if c.use_matching_loss:
            self.itm_head = MLPHead(2, dtype=c.dtype)
        if c.use_bbox_loss:
            self.bbox_head = MLPHead(4, dtype=c.dtype)
        if c.use_vision_tokenizer:
            self.mim_lm_head = nn.Dense(c.codebook_size, dtype=c.dtype)
        if c.vision_width != c.text_width:
            # dead-by-parity: the reference creates fusion_proj and never
            # applies it in any forward (reference models/xfm.py:538 is its
            # only mention) — kept so width-mismatched reference checkpoints
            # import/export losslessly; receives no gradient by design
            self.fusion_proj = nn.Dense(c.vision_width, dtype=c.dtype)

    def init_all(self, images, text_ids, text_atts):
        """Touch every head so flax init creates the complete param tree."""
        c = self.config
        image_embeds = self.get_vision_embeds(images)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        text_embeds = self.text_encoder.init_all(
            text_ids, attention_mask=text_atts)
        cross = self.fusion_encoder.init_all(
            text_ids, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts)
        out = cross[:, 0, :]
        if c.use_contrastive_loss:
            _ = self.get_features(image_embeds, text_embeds)
            _ = self.clamped_temp()
        if c.use_matching_loss:
            _ = self.itm_head(out)
        if c.use_bbox_loss:
            _ = self.bbox_head(out)
        if c.use_vision_tokenizer:
            _ = self.mim_lm_head(image_embeds[:, 1:, :])
        if c.vision_width != c.text_width:
            _ = self.fusion_proj(out)
        return image_embeds, text_embeds, cross

    # --- encoders ---------------------------------------------------------

    def get_vision_embeds(self, images, mask=None, idx_to_group_img=None,
                          image_atts=None, deterministic=True):
        """→ [B, 1+num_patches, vision_width] ([avgpool ‖ patches]);
        reference models/xfm.py:560-597 / models/beit2.py:423-475.
        uint8 input is CLIP-normalized on device (native-loader streams)."""
        from ..data.device_aug import maybe_normalize

        images = maybe_normalize(images)
        out = self.vision_encoder(images, mask=mask,
                                  idx_to_group_img=idx_to_group_img,
                                  image_atts=image_atts,
                                  deterministic=deterministic)
        if idx_to_group_img is not None:
            # region mode: expand the full-attention rows to one per region
            # (reference models/xfm.py:591-596 torch.gather to bsz)
            grouped, full = out
            full = jnp.take(full, idx_to_group_img, axis=0)
            return grouped, full
        return out

    def get_vision_embeds_pair(self, images, mask, deterministic=True):
        """(full, MIM-masked) vision embeds of the same images, fused into
        one 2B-row pass when the vision encoder supports it (BEiT-2).
        Replaces the reference's two separate vision forwards per pretrain
        batch (reference models/model_pretrain.py:30-77)."""
        from ..data.device_aug import maybe_normalize

        images = maybe_normalize(images)
        if hasattr(self.vision_encoder, "pair"):
            return self.vision_encoder.pair(images, mask,
                                            deterministic=deterministic)
        return (self.get_vision_embeds(images, deterministic=deterministic),
                self.get_vision_embeds(images, mask=mask,
                                       deterministic=deterministic))

    def get_text_embeds(self, text_ids, text_atts, deterministic=True):
        """Text-only pass through the text encoder
        (reference models/xfm.py:600-611)."""
        return self.text_encoder(text_ids, attention_mask=text_atts,
                                 mode="multi_modal",
                                 deterministic=deterministic)

    def get_cross_embeds(self, image_embeds, image_atts=None, text_ids=None,
                         text_embeds=None, text_atts=None, is_pretrain=True,
                         deterministic=True, image_row_idx=None,
                         image_group_size=None):
        """Fusion encoder with image cross-attention
        (reference models/xfm.py:659-680). In pretraining, precomputed text
        embeds are detached before fusion (reference models/xfm.py:674).

        `image_row_idx` ([rows] int): image_embeds carries only the unique
        images; cross k/v are projected once per unique image and gathered
        per row inside the attention layers (saves ~2/3 of the ITM
        hard-negative pass' cross-projection FLOPs vs re-projecting the
        gathered rows as the reference does, models/xfm.py:788-795).

        `image_group_size` (static int): grouped-batch variant — text rows
        come in contiguous runs of `image_group_size` sharing one unique
        image (the retrieval-rerank shape); cross-attention views q as
        [U, gs·T, H, D] against per-unique k/v, so nothing is repeated OR
        gathered (text_encoder.SelfAttention kv_group_size)."""
        if text_embeds is not None:
            x = jax.lax.stop_gradient(text_embeds) if is_pretrain \
                else text_embeds
            return self.fusion_encoder(
                inputs_embeds=x, attention_mask=text_atts,
                encoder_hidden_states=image_embeds,
                encoder_attention_mask=image_atts,
                deterministic=deterministic, encoder_row_idx=image_row_idx,
                encoder_group_size=image_group_size)
        return self.fusion_encoder(
            text_ids, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts,
            deterministic=deterministic, encoder_row_idx=image_row_idx,
            encoder_group_size=image_group_size)

    def get_features(self, image_embeds=None, text_embeds=None):
        """l2-normalized cls projections (reference models/xfm.py:614-621)."""
        def norm(x):
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        if image_embeds is None:
            return norm(self.text_proj(text_embeds[:, 0, :]))
        if text_embeds is None:
            return norm(self.vision_proj(image_embeds[:, 0, :]))
        return (norm(self.vision_proj(image_embeds[:, 0, :])),
                norm(self.text_proj(text_embeds[:, 0, :])))

    def clamped_temp(self):
        c = self.config
        if not c.learnable_temp:
            return jnp.asarray(c.temp, jnp.float32)
        return jnp.clip(self.temp, c.min_temp, c.max_temp)

    # --- losses -----------------------------------------------------------

    def get_contrastive_loss(self, image_feat, text_feat, idx=None):
        return losses.contrastive_loss(image_feat, text_feat,
                                       self.clamped_temp(), idx=idx)

    def get_matching_loss(self, rng, image_embeds, image_atts, image_feat,
                          text_ids, text_atts, text_feat, idx=None,
                          text_embeds=None, is_pretrain=True,
                          deterministic=True, return_cross_embeds=False,
                          fixed_negatives=None):
        """ITM with in-batch hard negatives (reference models/xfm.py:749-802).
        1 positive + 2 negative fusion passes, batched as in the reference
        (pos alone; [text_pos×image_neg ‖ text_neg×image_pos] together).
        `fixed_negatives=(image_neg, text_neg)` bypasses sampling — used by
        golden-parity tests to replay the reference's sampled indices."""
        if fixed_negatives is not None:
            image_neg, text_neg = fixed_negatives
        else:
            image_neg, text_neg = losses.hard_negative_indices(
                rng, image_feat, text_feat, self.clamped_temp(), idx=idx)

        B = text_ids.shape[0]
        txt_ids_neg = jnp.take(text_ids, text_neg, axis=0)
        txt_atts_neg = jnp.take(text_atts, text_neg, axis=0)
        txt_emb_neg = (jnp.take(text_embeds, text_neg, axis=0)
                       if text_embeds is not None else None)

        text_ids_all = jnp.concatenate([text_ids, txt_ids_neg], 0)
        text_atts_all = jnp.concatenate([text_atts, txt_atts_neg], 0)
        text_embeds_all = (jnp.concatenate([text_embeds, txt_emb_neg], 0)
                           if text_embeds is not None else None)
        # Optionally reference images by INDEX into the unique B images for
        # the neg pass ([text_pos x image_neg ‖ text_neg x image_pos]) so
        # cross k/v are projected once per unique image. Measured on v5e:
        # SLOWER at 224px/N=197 (208.9 vs 215.7 samples/s — the per-layer
        # gathered-k/v materialization + scatter-add backward outweigh the
        # saved projections) but FASTER at 384px/N=577 (retrieval train
        # 169.6 vs 159.2, 49.8% vs 46.7% MFU) where the projection term has
        # grown 3x. Auto-enabled from 577 image tokens;
        # XFM_SHARED_CROSS_KV=0/1 forces either way.
        env = os.environ.get("XFM_SHARED_CROSS_KV")
        if env is not None:
            shared_kv = env == "1"
        else:
            shared_kv = image_embeds.shape[1] >= 577
        if shared_kv:
            row_idx = jnp.concatenate(
                [image_neg, jnp.arange(B, dtype=image_neg.dtype)], 0)
            image_embeds_all = image_embeds
            image_atts_all = (jnp.take(image_atts, row_idx, axis=0)
                              if image_atts is not None else None)
        else:
            row_idx = None
            img_emb_neg = jnp.take(image_embeds, image_neg, axis=0)
            image_embeds_all = jnp.concatenate([img_emb_neg, image_embeds],
                                               0)
            image_atts_all = (jnp.concatenate(
                [jnp.take(image_atts, image_neg, axis=0), image_atts], 0)
                if image_atts is not None else None)

        # two fusion passes exactly like the reference (models/xfm.py:788-795)
        # — measured faster than one fused 3B pass on v5e (153.6 vs 145.2
        # samples/s: the 3B concat raises peak memory and spills)
        cross_pos = self.get_cross_embeds(
            image_embeds, image_atts, text_ids=text_ids,
            text_embeds=text_embeds, text_atts=text_atts,
            is_pretrain=is_pretrain, deterministic=deterministic)[:, 0, :]
        cross_neg = self.get_cross_embeds(
            image_embeds_all, image_atts_all, text_ids=text_ids_all,
            text_embeds=text_embeds_all, text_atts=text_atts_all,
            is_pretrain=is_pretrain, deterministic=deterministic,
            image_row_idx=row_idx)[:, 0, :]

        logits = self.itm_head(jnp.concatenate([cross_pos, cross_neg], 0))
        bs = cross_pos.shape[0]
        labels = jnp.concatenate([jnp.ones(bs, jnp.int32),
                                  jnp.zeros(2 * bs, jnp.int32)])
        loss = cross_entropy(logits, labels)
        if return_cross_embeds:
            return loss, cross_pos
        return loss

    def get_matching_and_fuse_mlm_loss(self, rng, image_embeds, image_atts,
                                       image_feat, text_ids, text_atts,
                                       text_feat, text_embeds,
                                       text_ids_masked, masked_pos,
                                       masked_ids, deterministic=True):
        """ITM (1 pos + 2 hard-neg rows) AND fusion-MLM in ONE 4B-row fusion
        pass. Loss-identical to get_matching_loss + get_fuse_mlm_loss (the
        reference runs them as three separate fusion forwards,
        models/xfm.py:638-656,788-795); batching quadruples the fusion
        matmuls' M dimension for better MXU fill. Pretrain-only (text embeds
        into fusion are detached, so the concat adds no backward FLOPs)."""
        B = text_ids.shape[0]
        image_neg, text_neg = losses.hard_negative_indices(
            rng, image_feat, text_feat, self.clamped_temp(), idx=None)

        enc_masked = self.get_text_embeds(text_ids_masked, text_atts,
                                          deterministic)
        if self.config.detach_text_forMLM:
            enc_masked = jax.lax.stop_gradient(enc_masked)
        text_embeds = jax.lax.stop_gradient(text_embeds)

        from ..core.mesh import constrain_batch_sharding

        # rows: [pos(B) ‖ text_pos×image_neg(B) ‖ text_neg×image_pos(B) ‖ mlm(B)]
        emb_all = constrain_batch_sharding(jnp.concatenate(
            [text_embeds, text_embeds,
             jnp.take(text_embeds, text_neg, axis=0), enc_masked], 0))
        atts_all = jnp.concatenate(
            [text_atts, text_atts,
             jnp.take(text_atts, text_neg, axis=0), text_atts], 0)
        ar = jnp.arange(B, dtype=image_neg.dtype)
        row_idx = jnp.concatenate([ar, image_neg, ar, ar], 0)
        iatts_all = jnp.take(image_atts, row_idx, axis=0)

        hidden = self.fusion_encoder(
            inputs_embeds=emb_all, attention_mask=atts_all,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=iatts_all,
            deterministic=deterministic, encoder_row_idx=row_idx)

        itm_logits = self.itm_head(hidden[: 3 * B, 0, :])
        labels = jnp.concatenate([jnp.ones(B, jnp.int32),
                                  jnp.zeros(2 * B, jnp.int32)])
        loss_itm = cross_entropy(itm_logits, labels)

        mlm_logits = self.fusion_encoder.mlm_logits(hidden[3 * B:],
                                                    masked_pos)
        loss_mlm = cross_entropy(mlm_logits, masked_ids)
        return loss_itm, loss_mlm

    def get_fuse_mlm_loss(self, text_ids_masked, text_atts, image_embeds,
                          image_atts, masked_pos, masked_ids,
                          deterministic=True):
        """Fusion-MLM (reference models/xfm.py:638-656): masked text through
        the text encoder, (detached), then the fusion encoder + MLM head over
        masked positions."""
        enc = self.get_text_embeds(text_ids_masked, text_atts, deterministic)
        if self.config.detach_text_forMLM:
            enc = jax.lax.stop_gradient(enc)
        hidden = self.fusion_encoder(
            inputs_embeds=enc, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, deterministic=deterministic)
        logits = self.fusion_encoder.mlm_logits(hidden, masked_pos)
        return cross_entropy(logits, masked_ids)

    def get_mlm_loss(self, text_ids_masked, text_atts, masked_pos, masked_ids,
                     image_embeds=None, image_atts=None, deterministic=True):
        """Text-encoder MLM (reference models/xfm.py:806-813)."""
        hidden = self.text_encoder(
            text_ids_masked, attention_mask=text_atts,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, deterministic=deterministic)
        logits = self.text_encoder.mlm_logits(hidden, masked_pos)
        return cross_entropy(logits, masked_ids)

    def get_mim_loss(self, image_embeds_masked, targets, mask,
                     vqkd_code_ids=None):
        """MIM (reference models/xfm.py:624-635): VQ-KD CE when a tokenizer
        is configured, else feature-regression MSE against the unmasked
        forward."""
        if self.config.use_vision_tokenizer:
            if vqkd_code_ids is None:
                raise ValueError(
                    "use_vision_tokenizer=True: MIM needs vqkd_code_ids "
                    "from the frozen VQ-KD tokenizer (the pretrain task "
                    "computes them when the YAML sets use_vision_tokenizer "
                    "+ tokenizer_model; reference models/xfm.py:625-629)")
            logits = self.mim_lm_head(image_embeds_masked[:, 1:, :])
            return losses.mim_vqkd_loss(logits, vqkd_code_ids, mask)
        return losses.mim_mse_loss(image_embeds_masked, targets, mask,
                                   cls_too=not self.config.mim_cls_only)

    def get_bbox_loss(self, output_coord, target_bbox, is_image=None):
        return losses.bbox_loss(output_coord, target_bbox, is_image)

    def predict_bbox(self, image_embeds, text_ids=None, text_atts=None,
                     text_embeds=None, is_pretrain=True, deterministic=True):
        """Fusion cls → bbox head → sigmoid cxcywh
        (reference models/xfm.py:843-854)."""
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        cls = self.get_cross_embeds(
            image_embeds, image_atts, text_ids=text_ids,
            text_embeds=text_embeds, text_atts=text_atts,
            is_pretrain=is_pretrain, deterministic=deterministic)[:, 0, :]
        return jax.nn.sigmoid(self.bbox_head(cls))

    def __call__(self, images, text_ids, text_atts, deterministic=True):
        """Plain forward used for init/shape-checking: vision + text + one
        fusion pass."""
        image_embeds = self.get_vision_embeds(images,
                                              deterministic=deterministic)
        text_embeds = self.get_text_embeds(text_ids, text_atts, deterministic)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        cross = self.get_cross_embeds(image_embeds, image_atts,
                                      text_ids=text_ids,
                                      text_embeds=text_embeds,
                                      text_atts=text_atts,
                                      deterministic=deterministic)
        return image_embeds, text_embeds, cross
