"""Parity verification for the released X-FM checkpoint (xfm_1b3.th).

BASELINE.md's parity clause asks for "loading the released `xfm_1b3.th`
checkpoint with numerically-matched logits". The artifact is not present in
this environment, so tests/test_golden_parity.py pins code-vs-code parity
with seeded weights instead; this script makes the released-checkpoint check
ONE command the moment the file is available:

  python scripts/verify_released_ckpt.py --ckpt /path/to/xfm_1b3.th
  python scripts/verify_released_ckpt.py --dry-run

Both modes:
  1. build the reference torch XFMBase (/root/reference on sys.path, CPU)
     and load the SAME weights into it and — via the checkpoint importer —
     into this repo's Flax XFMBase;
  2. run fixed seeded inputs through both: vision/text towers, projected
     features, ITC (+idx), ITM (recorded hard negatives), fusion-MLM, MIM,
     bbox head;
  3. print a parity report at the golden-fixture tolerances and exit
     non-zero on any failure.

--dry-run exercises the identical code path at a tiny config with seeded
synthetic weights (no artifact needed) — it is what the test suite runs.
Decode-level parity (KV-cache greedy decode, token-for-token) is pinned
separately by tests/test_golden_parity.py::test_greedy_decode_matches_reference.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

# parity math is fp32 on host — don't grab (or wait on) an attached TPU.
# (This jax build's TPU plugin ignores the JAX_PLATFORMS env var; the config
# route below works and must run before backend init.)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

TOL = {
    # (atol, rtol) — the tolerances test_golden_parity.py uses.
    # vision_out gets the 5e-4 atol of the golden MLM-logits check: the
    # trunk accumulates fp32 backend order differences (torch oneDNN vs
    # XLA) over the full depth before any normalization.
    "vision_out": (5e-4, 1e-3),
    "text_out": (2e-4, 1e-3),
    "image_feat": (2e-4, 1e-3),
    "text_feat": (2e-4, 1e-3),
    "coords": (2e-4, 1e-3),
    "loss_itc": (2e-4, 2e-3),
    "loss_itc_idx": (2e-4, 2e-3),
    "loss_itm": (2e-4, 2e-3),
    "loss_mlm": (2e-4, 2e-3),
    "loss_mim": (2e-4, 2e-3),
    "loss_bbox": (2e-4, 2e-3),
    "loss_giou": (2e-4, 2e-3),
}


def _build_reference(args):
    """Reference torch XFMBase + its config dict. Tiny (dry-run) or base."""
    import torch

    import make_golden_fixtures as g

    g.install_stubs()
    sys.path.insert(0, "/root/reference")
    # the reference targets transformers 4.x where these lived in
    # modeling_utils; newer releases moved them to pytorch_utils
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for sym in ("apply_chunking_to_forward",
                "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, sym):
            setattr(mu, sym, getattr(pu, sym))
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            backend="gloo", init_method=f"file://{tempfile.mktemp()}",
            world_size=1, rank=0)

    tmpdir = tempfile.mkdtemp()
    if args.dry_run:
        model, cfg = g._tiny_reference_xfm(tmpdir)
        g.seed_weights(model, 5)
        with torch.no_grad():
            model.temp.fill_(0.07)
        sd = model.state_dict()
        return model, cfg, sd

    # base config mirroring reference configs/xfm-pt/Pretrain_XBrain_base_4m.yaml
    txtdir = os.path.join(tmpdir, "roberta-base")
    os.makedirs(txtdir, exist_ok=True)
    with open(os.path.join(txtdir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["RobertaForMaskedLM"], "vocab_size": 50265,
            "hidden_size": 768, "num_hidden_layers": 12,
            "num_attention_heads": 12, "intermediate_size": 3072,
            "max_position_embeddings": 514, "type_vocab_size": 1,
            "layer_norm_eps": 1e-5, "pad_token_id": 1, "bos_token_id": 0,
            "eos_token_id": 2, "hidden_act": "gelu",
            "model_type": "roberta"}, f)
    cfg = {
        "text_encoder": txtdir, "use_beit_v2": True,
        "vision_config": "/root/reference/configs/model/config_beit2_base.json",
        "image_res": 224, "patch_size": 16, "local_attn_depth": -1,
        "text_num_hidden_layers": 12, "text_fusion_start_at": 12,
        "fusion_num_hidden_layers": 12, "fusion_fusion_start_at": 0,
        "embed_dim": 256, "temp": 0.07, "max_tokens": 30, "max_masks": 15,
    }
    import models.xfm as rxfm

    model = rxfm.XFMBase(cfg, load_vision_params=False,
                         load_text_params=False, use_contrastive_loss=True,
                         use_matching_loss=True, use_mlm_loss=True,
                         use_bbox_loss=True)

    raw = torch.load(args.ckpt, map_location="cpu")
    for key in ("model", "module", "state_dict"):
        if isinstance(raw, dict) and key in raw and isinstance(raw[key], dict):
            raw = raw[key]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in raw.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    print(f"reference load_state_dict: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")
    for k in list(missing)[:10]:
        print("  missing:", k)
    for k in list(unexpected)[:10]:
        print("  unexpected:", k)
    sd = model.state_dict()  # canonical key set for the importer
    return model, cfg, sd


def _reference_outputs(model, cfg, rng_seed=6):
    """Run the reference model on fixed inputs; returns (inputs, outputs)."""
    import torch

    model.eval()
    r = np.random.RandomState(rng_seed)
    res = cfg["image_res"]
    B, T = 2, min(16, cfg.get("max_tokens", 16))
    M = min(5, T - 2)
    N = (res // cfg["patch_size"]) ** 2
    vocab = model.text_encoder.config.vocab_size

    image = torch.from_numpy(r.randn(B, 3, res, res).astype(np.float32))
    ids = torch.from_numpy(r.randint(3, vocab, (B, T)).astype(np.int64))
    atts = torch.ones(B, T, dtype=torch.long)
    atts[1, T - 3:] = 0
    ids_masked = torch.from_numpy(
        r.randint(3, vocab, (B, T)).astype(np.int64))
    masked_pos = torch.from_numpy(
        np.stack([np.arange(1, M + 1)] * B).astype(np.int64))
    masked_ids = torch.from_numpy(r.randint(3, vocab, (B, M)).astype(np.int64))
    mask = torch.zeros(B, N, dtype=torch.bool)
    mask[:, : N // 3] = True
    target_bbox = torch.from_numpy(
        np.clip(r.rand(B, 4).astype(np.float32), 0.2, 0.8))
    idx = torch.tensor([7, 7])

    neg_seq = iter([1, 0, 1, 0])
    fixed = []

    def fake_multinomial(weights, num, *a, **k):
        v = next(neg_seq)
        fixed.append(v)
        return torch.tensor([v])

    mult = torch.multinomial
    torch.multinomial = fake_multinomial
    try:
        with torch.no_grad():
            image_embeds, image_atts_t = model.get_vision_embeds(image)
            # masked vision forward with OUR recorded mask (mirrors reference
            # models/beit2.py:431-466 forward_avgpool internals)
            ve = model.vision_encoder
            x = ve.patch_embed(image)
            w = mask.unsqueeze(-1).type_as(x)
            mask_token = ve.mask_token.expand(x.shape[0], x.shape[1], -1)
            xm = x * (1 - w) + mask_token * w
            cls = ve.cls_token.expand(x.shape[0], -1, -1)
            xm = torch.cat((cls, xm), dim=1)
            rel = ve.rel_pos_bias() if ve.rel_pos_bias is not None else None
            for blk in ve.blocks:
                xm = blk(xm, rel_pos_bias=rel)
            _, patches = torch.split(xm, [1, xm.shape[1] - 1], dim=1)
            patches = ve.fc_norm(ve.norm(patches))
            xm_cls = ve.avgpool(patches.transpose(1, 2)).transpose(1, 2)
            image_embeds_masked = torch.cat([xm_cls, patches], dim=1)

            text_embeds = model.get_text_embeds(ids, atts)
            image_feat, text_feat = model.get_features(image_embeds,
                                                       text_embeds)
            out = {
                "vision_out": image_embeds.numpy(),
                "text_out": text_embeds.numpy(),
                "image_feat": image_feat.numpy(),
                "text_feat": text_feat.numpy(),
                "loss_itc": model.get_contrastive_loss(
                    image_feat, text_feat).item(),
                "loss_itc_idx": model.get_contrastive_loss(
                    image_feat, text_feat, idx=idx).item(),
                "loss_itm": model.get_matching_loss(
                    image_embeds, image_atts_t, image_feat, ids, atts,
                    text_feat, text_embeds=text_embeds,
                    is_pretrain=True).item(),
                "loss_mlm": model.get_fuse_mlm_loss(
                    ids_masked, atts, image_embeds, image_atts_t,
                    masked_pos, masked_ids).item(),
                "loss_mim": model.get_mim_loss(
                    image_embeds_masked, image_embeds, mask).item(),
            }
            coords = model.predict_bbox(image_embeds, ids, atts, text_embeds)
            lb, lg = model.get_bbox_loss(coords, target_bbox)
            out["coords"] = coords.numpy()
            out["loss_bbox"], out["loss_giou"] = lb.item(), lg.item()
    finally:
        torch.multinomial = mult

    inputs = dict(image=image.numpy(), ids=ids.numpy(), atts=atts.numpy(),
                  ids_masked=ids_masked.numpy(),
                  masked_pos=masked_pos.numpy(),
                  masked_ids=masked_ids.numpy(), mask=mask.numpy(),
                  target_bbox=target_bbox.numpy(), idx=idx.numpy(),
                  image_neg=np.asarray(fixed[:2]),
                  text_neg=np.asarray(fixed[2:]))
    return inputs, out


def _our_config(args, ref_cfg):
    from xfm_tpu.models.beit2 import VisionConfig
    from xfm_tpu.models.text_encoder import TextConfig
    from xfm_tpu.models.xfm import XFMConfig
    import jax.numpy as jnp

    if args.dry_run:
        vis = VisionConfig(image_res=64, patch_size=16, embed_dim=96,
                           depth=3, num_heads=4, drop_path_rate=0.0,
                           init_values=0.1, use_rel_pos_bias=True,
                           use_abs_pos_emb=False, use_mean_pooling=True)
        kw = dict(vocab_size=99, hidden_size=48, num_hidden_layers=4,
                  num_attention_heads=4, intermediate_size=96,
                  max_position_embeddings=40, encoder_width=96,
                  pad_token_id=1, hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0, layer_norm_eps=1e-5,
                  position_style="roberta")
        text = TextConfig(fusion_layer=4, **kw)
        fusion = TextConfig(**{**kw, "num_hidden_layers": 2,
                               "fusion_layer": 0})
        embed_dim = 32
    else:
        vis = VisionConfig.beit_base(
            image_res=ref_cfg["image_res"], drop_path_rate=0.0,
            init_values=0.1, use_rel_pos_bias=True, use_abs_pos_emb=False,
            use_mean_pooling=True, dtype=jnp.float32)
        kw = dict(hidden_dropout_prob=0.0,
                  attention_probs_dropout_prob=0.0, encoder_width=768,
                  dtype=jnp.float32)
        text = TextConfig.roberta_base(fusion_layer=12,
                                       num_hidden_layers=12, **kw)
        fusion = TextConfig.roberta_base(fusion_layer=0,
                                         num_hidden_layers=12, **kw)
        embed_dim = ref_cfg["embed_dim"]
    return XFMConfig(vision=vis, text=text, fusion=fusion,
                     embed_dim=embed_dim, temp=0.07,
                     use_contrastive_loss=True, use_matching_loss=True,
                     use_mlm_loss=True, use_bbox_loss=True)


def _our_outputs(cfg, sd, io):
    import jax
    import jax.numpy as jnp

    from xfm_tpu.models.xfm import XFMBase
    from xfm_tpu.train.checkpoint import (import_xfm_checkpoint,
                                          merge_params, to_jax)

    model = XFMBase(cfg)
    images = jnp.asarray(io["image"].transpose(0, 2, 3, 1))
    ids = jnp.asarray(io["ids"], jnp.int32)
    atts = jnp.asarray(io["atts"], jnp.int32)
    init = model.init({"params": jax.random.PRNGKey(0)}, images, ids, atts,
                      method=XFMBase.init_all)["params"]
    sd_np = {k: np.asarray(v) for k, v in sd.items()}
    imported = to_jax(import_xfm_checkpoint(sd_np, cfg))["backbone"]
    params, missing, unexpected = merge_params(init, imported)
    print(f"importer merge: {len(missing)} missing, "
          f"{len(unexpected)} unexpected")
    for k in list(missing)[:10]:
        print("  missing:", k)
    if missing:
        raise SystemExit("importer left params unmapped — aborting")

    mask = jnp.asarray(io["mask"])
    neg = (jnp.asarray(io["image_neg"], jnp.int32),
           jnp.asarray(io["text_neg"], jnp.int32))

    def compute(m):
        image_embeds = m.get_vision_embeds(images)
        image_atts = jnp.ones(image_embeds.shape[:2], jnp.int32)
        embeds_masked = m.get_vision_embeds(images, mask=mask)
        text_embeds = m.get_text_embeds(ids, atts)
        image_feat, text_feat = m.get_features(image_embeds, text_embeds)
        out = {
            "vision_out": image_embeds,
            "text_out": text_embeds,
            "image_feat": image_feat,
            "text_feat": text_feat,
            "loss_itc": m.get_contrastive_loss(image_feat, text_feat),
            "loss_itc_idx": m.get_contrastive_loss(
                image_feat, text_feat,
                idx=jnp.asarray(io["idx"], jnp.int32)),
            "loss_itm": m.get_matching_loss(
                jax.random.PRNGKey(0), image_embeds, image_atts, image_feat,
                ids, atts, text_feat, text_embeds=text_embeds,
                is_pretrain=True, fixed_negatives=neg),
            "loss_mlm": m.get_fuse_mlm_loss(
                jnp.asarray(io["ids_masked"], jnp.int32), atts, image_embeds,
                image_atts, jnp.asarray(io["masked_pos"], jnp.int32),
                jnp.asarray(io["masked_ids"], jnp.int32)),
            "loss_mim": m.get_mim_loss(embeds_masked, image_embeds, mask),
        }
        coords = m.predict_bbox(image_embeds, text_atts=atts,
                                text_embeds=text_embeds)
        lb, lg = m.get_bbox_loss(coords, jnp.asarray(io["target_bbox"]))
        out["coords"] = coords
        out["loss_bbox"], out["loss_giou"] = lb, lg
        return out

    got = model.apply({"params": params}, method=compute)
    return {k: np.asarray(v) for k, v in got.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", help="path to the released xfm_1b3.th")
    ap.add_argument("--dry-run", action="store_true",
                    help="tiny synthetic checkpoint (no artifact needed)")
    args = ap.parse_args()
    if not args.dry_run and not args.ckpt:
        ap.error("--ckpt PATH or --dry-run required")

    model, cfg, sd = _build_reference(args)
    io, ref = _reference_outputs(model, cfg)
    ours = _our_outputs(_our_config(args, cfg), sd, io)

    print(f"\n{'output':<14} {'max_abs_diff':>13} {'tolerance':>18}  verdict")
    failed = []
    for k, (atol, rtol) in TOL.items():
        a, b = np.asarray(ours[k], np.float64), np.asarray(ref[k], np.float64)
        diff = float(np.max(np.abs(a - b)))
        bound = float(np.max(atol + rtol * np.abs(b)))
        ok = bool(np.all(np.abs(a - b) <= atol + rtol * np.abs(b)))
        print(f"{k:<14} {diff:13.3e} {f'atol={atol:g},rtol={rtol:g}':>18}  "
              f"{'PASS' if ok else 'FAIL'}")
        if not ok:
            failed.append((k, diff, bound))
    if failed:
        print(f"\nFAILED: {len(failed)} outputs out of tolerance")
        raise SystemExit(1)
    print("\nPARITY OK: all outputs within golden tolerances")


if __name__ == "__main__":
    main()
