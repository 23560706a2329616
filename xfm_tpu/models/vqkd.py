"""VQ-KD visual tokenizer (reference models/model_vqkd.py,
models/norm_ema_quantizer.py, models/vqkd_vit.py).

Provides MIM's discrete targets when `use_vision_tokenizer: True`
(reference models/xfm.py:104-112,488-496,625-629):
encoder ViT → 2-layer tanh projection (fp32) → l2-normalized codebook lookup
→ token ids. Training the tokenizer itself (decoder regressing CLIP/DINO
features with cosine loss, reference models/model_vqkd.py:190-220) is also
implemented.

TPU redesign of NormEMAVectorQuantizer (reference
models/norm_ema_quantizer.py:123-204):
- EMA codebook statistics are returned as *updates* from the pure apply and
  folded into variables by the caller's train step; the cross-replica
  all_reduce (reference :174-194) is GSPMD-automatic because cluster_size
  sums over the (globally sharded) batch.
- k-means init on first batch (reference norm_ema_quantizer.py:34-61,
  92-103: zero-init + `initted` flag, cosine k-means on the first batch's
  projections) becomes an explicit pre-training call —
  `kmeans_init_vq_stats` returns fresh `vq_stats` from sample projections;
  the caller installs them before step 0. Purely functional (no mutable
  `initted` buffer inside jit), same 10-iteration cosine k-means.
- `codebook_init_path` (reference norm_ema_quantizer.py:78-83) →
  `load_codebook_init`, reading a torch-saved tensor.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .beit2 import BeitVisionTransformer, VisionConfig


def l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@dataclasses.dataclass(frozen=True)
class VQKDConfig:
    # Reference encoder defaults (models/model_vqkd.py:243-246 /
    # vqkd_vit get_model_default_params): abs pos embed, NO rel-pos bias,
    # no LayerScale (init_values=0), mean-pooling norm layout — with
    # use_mean_pooling=True our BeitVisionTransformer applies fc_norm to the
    # patch tokens, matching vqkd_vit's return_patch_tokens → fc_norm(t)
    # (reference models/vqkd_vit.py:393-399).
    encoder: VisionConfig = VisionConfig(
        image_res=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        init_values=0.0, use_rel_pos_bias=False,
        use_shared_rel_pos_bias=False,
        use_abs_pos_emb=True, use_mean_pooling=True, drop_path_rate=0.0)
    decoder_depth: int = 3
    codebook_size: int = 8192
    codebook_dim: int = 32
    teacher_dim: int = 512          # CLIP ViT-B/16 projected dim
    ema_decay: float = 0.99
    beta: float = 1.0               # commitment weight
    dtype: Any = jnp.float32


def vqkd_config_from_yaml(config: dict) -> VQKDConfig:
    """YAML → VQKDConfig (reference models/xfm.py:104-112 reads
    `tokenizer_model` / `codebook_size` / `codebook_dim`; the registry name
    encodes decoder depth and teacher,
    reference models/model_vqkd.py:248-379). Tiny-model test overrides via
    `tokenizer_embed_dim` / `tokenizer_depth` / `tokenizer_num_heads`."""
    import re

    name = str(config.get("tokenizer_model",
                          "vqkd_encoder_base_decoder_3x768x12_clip"))
    m = re.search(r"decoder_(\d+)x\d+x\d+_(clip|dino)", name)
    dec_depth = int(m.group(1)) if m else 3
    teacher = m.group(2) if m else "clip"
    base = VQKDConfig()
    enc = dataclasses.replace(
        base.encoder,
        image_res=config.get("image_res", 224),
        patch_size=config.get("patch_size", 16),
        embed_dim=config.get("tokenizer_embed_dim", 768),
        depth=config.get("tokenizer_depth", 12),
        num_heads=config.get("tokenizer_num_heads", 12),
    )
    return VQKDConfig(
        encoder=enc, decoder_depth=dec_depth,
        codebook_size=config.get("codebook_size", 8192),
        codebook_dim=config.get("codebook_dim", 32),
        teacher_dim=512 if teacher == "clip" else 768,
    )


def cosine_kmeans(rng, samples, num_clusters, num_iters: int = 10):
    """Cosine-similarity k-means (reference norm_ema_quantizer.py:34-61,
    use_cosine_sim=True): means start as sampled rows, assignment by max
    dot product, empty clusters keep their previous mean.
    → (means [num_clusters, D] l2-normalized, bincounts [num_clusters])."""
    samples = l2norm(samples.astype(jnp.float32))
    n = samples.shape[0]
    idx = (jax.random.permutation(rng, n)[:num_clusters] if n >= num_clusters
           else jax.random.randint(rng, (num_clusters,), 0, n))
    means0 = samples[idx]

    def body(_, means):
        buckets = jnp.argmax(samples @ means.T, axis=-1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32)
        bins = onehot.sum(0)
        sums = onehot.T @ samples
        new = l2norm(sums / jnp.maximum(bins, 1.0)[:, None])
        return jnp.where((bins == 0)[:, None], means, new)

    means = jax.lax.fori_loop(0, num_iters, body, means0)
    bins = jax.nn.one_hot(jnp.argmax(samples @ means.T, axis=-1),
                          num_clusters, dtype=jnp.float32).sum(0)
    return means, bins


def kmeans_init_vq_stats(rng, z_samples, num_codes, num_iters: int = 10):
    """Data-driven codebook init (reference EmbeddingEMA.init_embed_,
    norm_ema_quantizer.py:92-103): cosine k-means over the first batch's
    projections `z_samples` [..., code_dim]. Returns a `vq_stats` collection
    ({'quantize': {'codebook', 'cluster_size'}}) for the caller to install
    into the VQKD variables before the first training step (the reference's
    `initted` buffer flow, made explicit/functional for jit)."""
    flat = z_samples.reshape(-1, z_samples.shape[-1])
    cb, bins = cosine_kmeans(rng, flat, num_codes, num_iters)
    return {"quantize": {"codebook": cb, "cluster_size": bins}}


def load_codebook_init(path):
    """`codebook_init_path` (reference norm_ema_quantizer.py:78-83): a
    torch-saved [num_codes, code_dim] tensor → jnp array."""
    import torch

    w = torch.load(path, map_location="cpu")
    if hasattr(w, "state_dict"):  # pragma: no cover - tensor files expected
        raise ValueError("codebook_init_path must hold a tensor")
    return jnp.asarray(w.detach().float().numpy())


class NormEMAQuantizer(nn.Module):
    """l2-normalized codebook with EMA updates
    (reference models/norm_ema_quantizer.py:123-204)."""
    num_codes: int
    code_dim: int
    decay: float = 0.99
    beta: float = 1.0

    def setup(self):
        init = nn.initializers.normal(1.0)
        self.codebook = self.variable(
            "vq_stats", "codebook",
            lambda: l2norm(init(jax.random.PRNGKey(0),
                                (self.num_codes, self.code_dim))))
        self.cluster_size = self.variable(
            "vq_stats", "cluster_size",
            lambda: jnp.zeros((self.num_codes,)))

    def indices(self, z):
        """Nearest-neighbor code ids for [..., code_dim] inputs."""
        zf = l2norm(z.astype(jnp.float32))
        flat = zf.reshape(-1, self.code_dim)
        cb = self.codebook.value
        d = (jnp.sum(flat ** 2, -1, keepdims=True)
             - 2 * flat @ cb.T + jnp.sum(cb ** 2, -1)[None])
        ids = jnp.argmin(d, axis=-1)
        return ids.reshape(z.shape[:-1])

    def __call__(self, z, update_ema: bool = False):
        """→ (quantized, loss, ids). Straight-through estimator
        (reference :200); EMA stats update when `update_ema` under a mutable
        'vq_stats' collection."""
        zf = l2norm(z.astype(jnp.float32))
        ids = self.indices(zf)
        onehot = jax.nn.one_hot(ids.reshape(-1), self.num_codes,
                                dtype=jnp.float32)
        zq = jnp.take(self.codebook.value, ids.reshape(-1), axis=0)
        zq = zq.reshape(zf.shape)

        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(zq) - zf) ** 2)

        if update_ema and not self.is_initializing():
            flat = zf.reshape(-1, self.code_dim)
            counts = jnp.sum(onehot, axis=0)               # global via GSPMD
            embed_sum = onehot.T @ flat
            new_cluster = (self.cluster_size.value * self.decay
                           + counts * (1 - self.decay))
            # normalized EMA codebook (reference :174-194)
            embed_mean = embed_sum / jnp.maximum(counts[:, None], 1.0)
            new_cb = l2norm(self.codebook.value * self.decay
                            + l2norm(embed_mean) * (1 - self.decay))
            keep = (counts == 0)[:, None]
            self.codebook.value = jnp.where(keep, self.codebook.value,
                                            new_cb)
            self.cluster_size.value = new_cluster

        # straight-through
        zq = zf + jax.lax.stop_gradient(zq - zf)
        return zq, loss, ids


class VQKD(nn.Module):
    config: VQKDConfig

    def setup(self):
        c = self.config
        self.encoder = BeitVisionTransformer(c.encoder)
        self.encode_task_layer = [
            nn.Dense(c.encoder.embed_dim, dtype=jnp.float32),
            nn.Dense(c.codebook_dim, dtype=jnp.float32),
        ]
        self.quantize = NormEMAQuantizer(c.codebook_size, c.codebook_dim,
                                         c.ema_decay, c.beta)
        dec_cfg = dataclasses.replace(c.encoder, depth=c.decoder_depth)
        self.decoder = BeitVisionTransformerBody(dec_cfg)
        self.decode_task_layer = [
            nn.Dense(c.encoder.embed_dim, dtype=jnp.float32),
            nn.Dense(c.teacher_dim, dtype=jnp.float32),
        ]

    def _encode_z(self, images, deterministic=True):
        """pre_process rescale (reference models/model_vqkd.py:125-136
        expects inputs in [-1,1]; our pipeline provides CLIP-normalized
        floats — uint8 native-loader batches are CLIP-normalized on device
        here, same contract as XFMBase.get_vision_embeds) → encoder patches
        → fp32 tanh projection (reference :151-155)."""
        from ..data.device_aug import maybe_normalize

        images = maybe_normalize(images)
        feats = self.encoder(images, deterministic=deterministic)
        patches = feats[:, 1:, :].astype(jnp.float32)
        h = jnp.tanh(self.encode_task_layer[0](patches))
        z = self.encode_task_layer[1](h)
        return z

    def get_codebook_indices(self, images, deterministic=True):
        """Token ids for MIM CE (reference models/model_vqkd.py:173)."""
        z = self._encode_z(images, deterministic)
        return self.quantize.indices(z)

    def __call__(self, images, teacher_features, deterministic=True,
                 update_ema: bool = True):
        """Tokenizer training step (reference models/model_vqkd.py:190-220):
        cosine regression of decoder outputs against teacher features +
        commitment loss."""
        z = self._encode_z(images, deterministic)
        zq, vq_loss, ids = self.quantize(z, update_ema=update_ema)
        dec = self.decoder(zq.astype(self.config.dtype),
                           deterministic=deterministic)
        pred = self.decode_task_layer[1](
            jnp.tanh(self.decode_task_layer[0](dec.astype(jnp.float32))))
        t = l2norm(teacher_features.astype(jnp.float32))
        p = l2norm(pred)
        rec_loss = jnp.mean(1.0 - jnp.sum(p * t, axis=-1))
        return rec_loss + vq_loss, {"rec_loss": rec_loss,
                                    "vq_loss": vq_loss, "ids": ids}


class BeitVisionTransformerBody(nn.Module):
    """Decoder trunk: plain pre-LN ViT blocks over already-embedded tokens
    (reference models/vqkd_vit.py decoder usage)."""
    config: VisionConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        from .beit2 import BeitBlock

        c = self.config
        if x.shape[-1] != c.embed_dim:
            x = nn.Dense(c.embed_dim, name="in_proj", dtype=c.dtype)(x)
        for i in range(c.depth):
            x = BeitBlock(dataclasses.replace(c, use_rel_pos_bias=False),
                          name=f"block_{i}")(x,
                                             deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm",
                            dtype=c.dtype)(x)
