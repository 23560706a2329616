"""Flax BEiT-2 vision transformer — X-FM's default vision encoder.

Behavioral parity targets (reference models/beit2.py):
- fused bias-free qkv with separate learnable q/v biases (k bias fixed at 0)
  (reference models/beit2.py:84-90,129-132);
- per-block relative-position bias tables over (2W-1)^2 + 3 distances, the
  +3 covering cls↔token and cls↔cls (reference models/beit2.py:92-116);
- LayerScale gamma_1/gamma_2 (init 0.1) and stochastic depth
  (reference models/beit2.py:186-205,309);
- `fix_init_weight` rescale of proj/fc2 by 1/sqrt(2·layer)
  (reference models/beit2.py:327-333) — applied at init;
- avgpool forward: cls token is *dropped* after the blocks, patches go
  through fc_norm, and the returned "cls" slot is the mean-pooled patch
  feature: output = [avgpool ‖ patches] (reference models/beit2.py:456-466);
- MIM mask-token injection at block-masked positions
  (reference models/beit2.py:431-441) — the mask arrives as a model *input*
  (generated host-side by data.block_masking.MaskingGenerator) so the module
  stays pure/jittable;
- region-grouped readout via idx_to_group_img gather + masked avgpool
  (reference models/beit2.py:468-475).

TPU-first choices: NHWC images, patch embedding as one MXU matmul
(ops.patch_embed), attention through ops.dot_product_attention (Pallas fused
kernel on TPU) with the rel-pos bias passed as a [1, H, N, N] additive bias.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, remat_policy
from ..ops.fused_ln import FusedLayerNorm
from ..ops.patch_embed import extract_patches



@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_res: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: float = 0.1         # LayerScale init
    use_rel_pos_bias: bool = True    # per-block tables
    use_shared_rel_pos_bias: bool = False
    use_abs_pos_emb: bool = False
    use_mean_pooling: bool = True
    hidden_act: str = "gelu"        # 'gelu' = erf (reference-faithful);
                                    # 'gelu_tanh' = TPU-native (see ACT map)
    local_attn_depth: int = -1      # >0: last-k blocks run region attention
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    layer_norm_eps: float = 1e-6
    seq_shard: bool = False         # Megatron-SP sequence parallelism between
                                    # blocks (see TextConfig.seq_shard); the
                                    # 197-token dim shards unevenly over tp —
                                    # GSPMD pads — so this mainly pays at
                                    # 384/480px (577/901 tokens).
    remat: bool = False
    remat_policy: str = "full"
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.image_res // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @classmethod
    def beit_base(cls, image_res=224, **kw):
        return cls(image_res=image_res, embed_dim=768, depth=12, num_heads=12, **kw)

    @classmethod
    def beit_large(cls, image_res=224, **kw):
        return cls(image_res=image_res, embed_dim=1024, depth=24, num_heads=16, **kw)


def relative_position_index(window: tuple[int, int]) -> np.ndarray:
    """Static [N+1, N+1] index into the rel-pos table, incl. the 3 cls
    distances (reference models/beit2.py:99-116). Computed once in numpy."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


def num_relative_distance(window: tuple[int, int]) -> int:
    return (2 * window[0] - 1) * (2 * window[1] - 1) + 3


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference models/beit2.py:38-49)."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep,
                                    (x.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(mask, x / keep, 0.0)


def _rescaled_init(layer_id: int):
    """trunc_normal(0.02) divided by sqrt(2·layer) — the reference's
    fix_init_weight applied AS the initializer (reference
    models/beit2.py:327-333 rescales attn.proj / mlp.fc2 in place after
    trunc_normal init; layer_id is 1-based)."""
    import math

    return nn.initializers.truncated_normal(0.02 / math.sqrt(2.0 * layer_id))


class BeitAttention(nn.Module):
    config: VisionConfig
    layer_id: int = 1  # 1-based block index, for the proj init rescale

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, attn_bias=None,
                 deterministic=True):
        c = self.config
        B, N, C = x.shape
        H = c.num_heads
        D = C // H

        qkv = nn.Dense(3 * C, use_bias=False, name="qkv", dtype=c.dtype)(x)
        if c.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(qkv.dtype)
        if c.use_rel_pos_bias:
            window = (c.grid_size, c.grid_size)
            table = self.param(
                "relative_position_bias_table", nn.initializers.zeros,
                (num_relative_distance(window), H))
            from ..ops.attention import _on_tpu
            from ..ops.flash_attention import (beit_attention_relpos,
                                               relpos_inkernel_ok)
            from ..ops.relpos import beit_rel_pos_bias

            # dense one-hot-matmul construction, bit-exact with the gather
            # (ops/relpos.py) — the XLA gather was ~6 ms/step over 12
            # layers. On the long-seq TPU kernel path the bias is carried
            # bf16 (rounded once, post-construction): at N=901 the f32
            # [H, 900, 900] interleave transpose + kernel bias DMA are
            # ~12% of the whole step, and the kernel adds the bias to the
            # f32 scores after an exact bf16→f32 upcast. XFM_BF16_RELPOS=0
            # restores f32 end-to-end.
            bias_dtype = jnp.float32
            if (N >= 512 and _on_tpu()
                    and os.environ.get("XFM_BF16_RELPOS", "1") == "1"):
                bias_dtype = jnp.bfloat16
            if (rel_pos_bias is None and attn_bias is None
                    and (deterministic or c.attn_drop_rate == 0.0)
                    and relpos_inkernel_ok(N, window)):
                # long-seq TPU path: the bias never materializes — the
                # kernel expands the compact block-Toeplitz form in VMEM
                # (kills the [H, N, N] construction/DMA/db traffic, the
                # ~12% 480px step share in PERF.md round-4)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                out = beit_attention_relpos(
                    q.reshape(B, N, H, D), k.reshape(B, N, H, D),
                    v.reshape(B, N, H, D), table, window, D ** -0.5,
                    bias_dtype).reshape(B, N, C)
                return self._proj_out(out, deterministic)
            rpb = beit_rel_pos_bias(table, window, bias_dtype)  # [1,H,N,N]
            rel_pos_bias = rpb if rel_pos_bias is None else rel_pos_bias + rpb

        bias = rel_pos_bias
        if attn_bias is not None:
            bias = attn_bias if bias is None else bias + attn_bias

        from ..ops.flash_attention import (flash_attention_packed,
                                           packed_ok)

        if ((deterministic or c.attn_drop_rate == 0.0) and bias is not None
                and packed_ok(qkv.shape, H, bias, qkv.dtype)):
            # fused Pallas path straight off the packed qkv projection —
            # no HBM splits/transposes, bias block VMEM-resident (PERF.md)
            out = flash_attention_packed(qkv, bias, D ** -0.5, H)
        else:
            # split on the (contiguous) last axis — profiling showed the
            # [B,N,3,H,D]-then-slice-dim-2 form costs ~18 ms/step in
            # layout-copy fusions at B=48; last-axis slices are free views
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, H, D)
            k = k.reshape(B, N, H, D)
            v = v.reshape(B, N, H, D)
            drop_rng = None
            if not deterministic and c.attn_drop_rate > 0:
                drop_rng = self.make_rng("dropout")
            out = dot_product_attention(
                q, k, v, bias=bias, dropout_rate=c.attn_drop_rate,
                dropout_rng=drop_rng, deterministic=deterministic)
            out = out.reshape(B, N, C)
        return self._proj_out(out, deterministic)

    def _proj_out(self, out, deterministic):
        # shared tail: runs inside the compact __call__ trace on every path
        c = self.config
        from ..ops.attention import name_attn_out

        out = name_attn_out(out)  # saved by the 'attn_out' remat policy
        out = nn.Dense(c.embed_dim, name="proj", dtype=c.dtype,
                       kernel_init=_rescaled_init(self.layer_id))(out)
        return nn.Dropout(c.drop_rate)(out, deterministic=deterministic)


class BeitBlock(nn.Module):
    config: VisionConfig
    drop_path: float = 0.0
    layer_id: int = 1  # 1-based, for the fix_init_weight proj/fc2 rescale

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, attn_bias=None,
                 deterministic=True):
        c = self.config
        C = c.embed_dim
        # LayerScale only when init_values > 0 (reference models/beit2.py:
        # 186-189 creates gamma_1/2 only for init_values > 0)
        use_ls = c.init_values and c.init_values > 0
        if use_ls:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(c.init_values), (C,))
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(c.init_values), (C,))
        dp = DropPath(self.drop_path)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1",
                         dtype=c.dtype)(x)
        h = BeitAttention(c, layer_id=self.layer_id, name="attn")(
            h, rel_pos_bias, attn_bias, deterministic)
        if use_ls:
            h = gamma_1.astype(h.dtype) * h
        # residual add + norm2 through ops/fused_ln.py (one Pallas pass
        # under opt-in XFM_FUSED_LN=1; identical-math XLA composition by
        # default — measured faster, see fused_ln.fused_ln_ok). LayerScale/
        # DropPath multiplies stay outside so the fused site is plain x + y
        x, h = FusedLayerNorm(epsilon=c.layer_norm_eps, name="norm2",
                              dtype=c.dtype)(dp(h, deterministic),
                                             residual=x, return_sum=True)
        h = nn.Dense(int(C * c.mlp_ratio), name="fc1", dtype=c.dtype)(h)
        from .text_encoder import ActDense

        h = ActDense(C, act=c.hidden_act, name="fc2", dtype=c.dtype,
                     kernel_init=_rescaled_init(self.layer_id))(h)
        h = nn.Dropout(c.drop_rate)(h, deterministic=deterministic)
        if use_ls:
            h = gamma_2.astype(h.dtype) * h
        x = x + dp(h, deterministic)  # consumer LN is the NEXT block's
        return x                      # norm1 (not fusable across modules)


class BeitVisionTransformer(nn.Module):
    config: VisionConfig

    def setup(self):
        c = self.config
        self.patch_kernel = self.param(
            "patch_embed_kernel",
            nn.initializers.truncated_normal(0.02),
            (c.patch_size * c.patch_size * 3, c.embed_dim))
        self.patch_bias = self.param("patch_embed_bias",
                                     nn.initializers.zeros, (c.embed_dim,))
        self.cls_token = self.param("cls_token",
                                    nn.initializers.truncated_normal(0.02),
                                    (1, 1, c.embed_dim))
        self.mask_token = self.param("mask_token",
                                     nn.initializers.truncated_normal(0.02),
                                     (1, 1, c.embed_dim))
        if c.use_abs_pos_emb:
            self.pos_embed = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02),
                (1, c.num_patches + 1, c.embed_dim))
        if c.use_shared_rel_pos_bias:
            window = (c.grid_size, c.grid_size)
            self.shared_rel_pos_table = self.param(
                "shared_rel_pos_table", nn.initializers.zeros,
                (num_relative_distance(window), c.num_heads))
        dpr = np.linspace(0, c.drop_path_rate, c.depth)
        block_cls = BeitBlock
        if c.remat:
            block_cls = nn.remat(BeitBlock, static_argnums=(4,),
                                 policy=remat_policy(c.remat_policy))
        self.blocks = [block_cls(c, drop_path=float(dpr[i]),
                                 layer_id=i + 1, name=f"block_{i}")
                       for i in range(c.depth)]
        if c.use_mean_pooling:
            self.fc_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                        name="fc_norm", dtype=c.dtype)
        else:
            self.final_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           name="final_norm", dtype=c.dtype)

    def _patch_tokens(self, images):
        """[B, H, W, 3] NHWC → [B, num_patches, C] patch embeddings."""
        c = self.config
        patches = extract_patches(images.astype(self.patch_kernel.dtype),
                                  c.patch_size)
        x = patches.astype(c.dtype) @ self.patch_kernel.astype(c.dtype)
        return x + self.patch_bias.astype(c.dtype)

    def _apply_mim_mask(self, x, mask):
        """Swap block-masked patch embeddings for the learnable mask token
        (reference models/beit2.py:431-441)."""
        w = mask.astype(x.dtype)[..., None]
        return x * (1 - w) + self.mask_token.astype(x.dtype) * w

    def _add_cls(self, x):
        c = self.config
        B, _, C = x.shape
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (B, 1, C))
        x = jnp.concatenate([cls, x], axis=1)
        if c.use_abs_pos_emb:
            x = x + self.pos_embed.astype(x.dtype)
        return x

    def embed(self, images, mask=None, deterministic=True):
        """images: [B, H, W, 3] NHWC. mask: [B, num_patches] bool MIM mask."""
        x = self._patch_tokens(images)
        if mask is not None:
            x = self._apply_mim_mask(x, mask)
        return self._add_cls(x)

    def _encode(self, x, deterministic=True):
        """Run the block stack + avgpool readout over embedded tokens."""
        c = self.config
        shared_rpb = self._shared_rpb(x.shape[1])

        if c.seq_shard:
            from ..core.mesh import constrain_seq_sharding

            x = constrain_seq_sharding(x)
        for blk in self.blocks:
            x = blk(x, shared_rpb, None, deterministic)
            if c.seq_shard:
                x = constrain_seq_sharding(x)

        return self.readout(x)

    def readout(self, x):
        """Drop cls, normalize patches, prepend mean-pooled patch feature
        (reference models/beit2.py:456-466). Split out so the pipelined
        block stack (core/pipeline.py pipelined_beit_forward) can reuse
        the exact readout on its merged microbatches."""
        c = self.config
        patches = x[:, 1:, :]
        if c.use_mean_pooling:
            patches = self.fc_norm(patches)
        else:
            patches = self.final_norm(patches)
        pooled = jnp.mean(patches, axis=1, keepdims=True)
        return jnp.concatenate([pooled, patches], axis=1), patches

    def intermediate_layers(self, images, layer_ids=None,
                            deterministic=True):
        """Patch-token hidden states after selected blocks (reference
        models/beit2.py:483-536 forward_intermediate/get_intermediate_layers
        — the distillation surface; unused by the shipped tasks but part of
        the backbone API). Returns a list of [B, num_patches, C] arrays, one
        per entry of ``layer_ids`` (default: every block)."""
        x = self.embed(images, None, deterministic)
        shared_rpb = self._shared_rpb(x.shape[1])
        ids = (list(range(len(self.blocks))) if layer_ids is None
               else list(layer_ids))
        by_block = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x, shared_rpb, None, deterministic)
            if i in ids:
                by_block[i] = x[:, 1:, :]
        # honor the caller's layer_ids ORDER (and duplicates): distillation
        # targets are paired positionally with these outputs
        return [by_block[i] for i in ids]

    def pair(self, images, mask, deterministic=True):
        """Full + MIM-masked forward as ONE 2B-row pass.

        The pretrain step needs both an unmasked forward (ITC/ITM/MLM + the
        MIM regression target) and a masked forward of the *same* images
        (reference models/model_pretrain.py:30-77 runs the vision tower
        twice). Batching them doubles every matmul's M dimension, runs the
        rel-pos-bias gather once, and computes the patch embedding once —
        measurably better MXU utilization than two B-row passes.
        Returns (full_embeds, masked_embeds), each [B, 1+N, C].
        """
        from ..core.mesh import constrain_batch_sharding

        # Interleave (stack on a NEW axis + local reshape) instead of
        # concatenating along the batch axis: a concat along a fully
        # batch-sharded dim makes GSPMD replicate-then-repartition the
        # inputs ("involuntary full rematerialization", MULTICHIP_r01) —
        # the interleaved layout keeps each device's (full_i, masked_i)
        # pair local, so the reshape is free.
        x = self._patch_tokens(images)
        masked = self._apply_mim_mask(x, mask)
        B, N, C = x.shape
        x2 = jnp.stack([x, masked], axis=1).reshape(B * 2, N, C)
        x2 = constrain_batch_sharding(x2)
        full, _ = self._encode(self._add_cls(x2), deterministic)
        y = full.reshape(B, 2, *full.shape[1:])
        return y[:, 0], y[:, 1]

    def _shared_rpb(self, n_tokens):
        c = self.config
        if not c.use_shared_rel_pos_bias:
            return None
        from ..ops.relpos import beit_rel_pos_bias

        return beit_rel_pos_bias(self.shared_rel_pos_table,
                                 (c.grid_size, c.grid_size))

    def forward_localattn(self, images, idx_to_group_img, image_atts,
                          deterministic=True):
        """Region mode for local_attn_depth > 0 (reference
        models/beit2.py:373-419): the first depth-k blocks run full attention
        on the B images; per-region copies are then gathered via
        idx_to_group_img and the last k blocks run with the region patch
        masks ([R regions ‖ B full rows] in one batch). Readout keeps the
        raw token rows (fc_norm only — no avgpool/cls-drop restructuring).
        Returns (region_rows [R,1+N,C], full_rows [B,1+N,C])."""
        c = self.config
        x = self._add_cls(self._patch_tokens(images))
        shared_rpb = self._shared_rpb(x.shape[1])
        split = c.depth - c.local_attn_depth
        for blk in self.blocks[:split]:
            x = blk(x, shared_rpb, None, deterministic)
        xg = jnp.take(x, idx_to_group_img, axis=0)
        xall = jnp.concatenate([xg, x], axis=0)
        from ..ops.attention import mask_to_bias

        atts_blk = jnp.concatenate(
            [image_atts.astype(jnp.float32),
             jnp.ones(x.shape[:2], jnp.float32)], axis=0)
        bias = mask_to_bias(atts_blk)
        for blk in self.blocks[split:]:
            xall = blk(xall, shared_rpb, bias, deterministic)
        norm = self.fc_norm if c.use_mean_pooling else self.final_norm
        out = norm(xall)
        R = idx_to_group_img.shape[0]
        return out[:R], out[R:]

    def __call__(self, images, mask=None, idx_to_group_img=None,
                 image_atts=None, deterministic=True):
        c = self.config
        if idx_to_group_img is not None and c.local_attn_depth > 0:
            return self.forward_localattn(images, idx_to_group_img,
                                          image_atts, deterministic)
        x = self.embed(images, mask, deterministic)
        full, patches = self._encode(x, deterministic)

        if idx_to_group_img is None:
            return full

        # Region-grouped readout (reference models/beit2.py:468-475):
        # gather per-region copies of the patch grid, masked avg-pool as cls.
        xg = jnp.take(patches, idx_to_group_img, axis=0)
        w = image_atts[:, 1:].astype(xg.dtype)[..., None]
        pooled_g = jnp.sum(xg * w, axis=1, keepdims=True) / \
            jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)
        grouped = jnp.concatenate([pooled_g, xg], axis=1)
        return grouped, full
