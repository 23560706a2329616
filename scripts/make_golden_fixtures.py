"""Generate golden-logit parity fixtures from the reference implementation.

Runs the reference's own torch modules (/root/reference, CPU) with seeded
random weights on fixed inputs and saves {state_dict, inputs, outputs} so
tests/test_golden_parity.py can check our Flax modules — loaded through the
checkpoint importer — reproduce the logits (SURVEY.md §4.1: numerical-parity
fixtures; the released xfm_1b3.th is not available in this environment, so
the reference *code* is the oracle).

torchvision/timm are not installed; only the handful of symbols the
reference imports are stubbed (with faithful implementations where they
affect numerics — trunc_normal_ never does, weights get re-seeded anyway).
"""
import os
import sys
import types

import numpy as np
import torch

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def install_stubs():
    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")
    boxes.box_area = box_area
    ops.boxes = boxes
    tv.ops = ops

    timm = types.ModuleType("timm")
    tmodels = types.ModuleType("timm.models")
    tlayers = types.ModuleType("timm.models.layers")
    treg = types.ModuleType("timm.models.registry")
    tdata = types.ModuleType("timm.data")
    tconst = types.ModuleType("timm.data.constants")
    tvit = types.ModuleType("timm.models.vision_transformer")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        mask.floor_()
        return x.div(keep) * mask

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            return drop_path(x, self.drop_prob, self.training)

    def register_model(fn):
        return fn

    tlayers.to_2tuple = to_2tuple
    tlayers.trunc_normal_ = trunc_normal_
    tlayers.drop_path = drop_path
    tlayers.DropPath = DropPath
    treg.register_model = register_model
    tconst.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    tconst.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    def _cfg(**kw):
        return kw

    class PatchEmbed(torch.nn.Module):  # only referenced by legacy vit.py
        pass

    tvit._cfg = _cfg
    tvit.PatchEmbed = PatchEmbed
    tmodels.layers = tlayers
    tmodels.registry = treg
    tmodels.vision_transformer = tvit
    timm.models = tmodels
    timm.data = tdata
    tdata.constants = tconst

    pkgres = types.ModuleType("pkg_resources")
    pkgres.packaging = types.ModuleType("pkg_resources.packaging")
    pkgres.packaging.version = types.ModuleType(
        "pkg_resources.packaging.version")
    pkgres.packaging.version.parse = lambda s: s

    tvt = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tvt, name, type(name, (), {}))
    tvt.InterpolationMode = type("InterpolationMode", (),
                                 {"BICUBIC": "bicubic",
                                  "BILINEAR": "bilinear",
                                  "NEAREST": "nearest"})
    tv.transforms = tvt

    import importlib.machinery as _mach

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    ftfy.__spec__ = _mach.ModuleSpec("ftfy", None)
    regex = types.ModuleType("regex")
    import re as _re
    regex.IGNORECASE = _re.IGNORECASE

    def _lazy_compile(pattern, flags=0):
        # \p{L}-style classes aren't `re`-parseable; the CLIP tokenizer that
        # compiles them is never exercised by the fixtures
        try:
            return _re.compile(pattern, flags)
        except _re.error:
            return types.SimpleNamespace(findall=lambda s: [],
                                         pattern=pattern)

    regex.compile = _lazy_compile
    regex.__spec__ = _mach.ModuleSpec("regex", None)

    for mod in (tv, ops, boxes, tvt, timm, tmodels, tlayers, treg, tdata,
                tconst, tvit, pkgres):
        mod.__spec__ = _mach.ModuleSpec(mod.__name__, None)

    sys.modules.update({
        "ftfy": ftfy, "regex": regex,
        "pkg_resources": pkgres,
        "torchvision": tv, "torchvision.ops": ops,
        "torchvision.ops.boxes": boxes,
        "torchvision.transforms": tvt,
        "timm": timm, "timm.models": tmodels, "timm.models.layers": tlayers,
        "timm.models.registry": treg, "timm.data": tdata,
        "timm.data.constants": tconst,
        "timm.models.vision_transformer": tvit,
    })


def seed_weights(model, seed, exclude=(), std=0.02):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k in sorted(sd):
        t = sd[k]
        if t.dtype.is_floating_point and not any(e in k for e in exclude):
            sd[k] = torch.randn(t.shape, generator=g) * std
    model.load_state_dict(sd)
    return model


def make_beit():
    from models.beit2 import VisionTransformer
    from functools import partial
    import torch.nn as nn

    torch.manual_seed(0)
    m = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=96, depth=3, num_heads=4,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), init_values=0.1,
        use_abs_pos_emb=False, use_rel_pos_bias=True, use_mean_pooling=True,
        init_scale=0.001, drop_path_rate=0.0)
    seed_weights(m, 1)
    m.eval()
    x = torch.from_numpy(
        np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32))
    with torch.no_grad():
        out = m(x)  # forward_avgpool: [B, 1+N, C] ([avgpool ‖ patches])
    np.savez(
        os.path.join(OUT, "golden_beit2.npz"),
        images=x.numpy(),
        out=out.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("beit2 fixture:", out.shape)


def make_clip_vit():
    """Reference CLIP-ViT tower (models/clip_vit.py:310-360) at tiny size,
    quick_gelu like the shipped configs/model/config_clipvitB.json."""
    from models.clip_vit import CLIPVisionTransformer

    torch.manual_seed(0)
    m = CLIPVisionTransformer(
        image_size=32, patch_size=8, hidden_size=24, hidden_act="quick_gelu",
        num_attention_heads=2, attention_dropout=0.0, intermediate_size=48,
        num_hidden_layers=2, local_attn_depth=0)
    seed_weights(m, 5)
    m.eval()
    x = torch.from_numpy(
        np.random.RandomState(6).randn(2, 3, 32, 32).astype(np.float32))
    with torch.no_grad():
        out = m(x)  # [B, 1+N, C] after post_layernorm
    np.savez(
        os.path.join(OUT, "golden_clip_vit.npz"),
        images=x.numpy(), out=out.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("clip_vit fixture:", out.shape)


def make_swin():
    """Reference Swin (models/swin_transformer.py:460-583) tiny 2-stage with
    a shifted block in stage 0; output is [avgpool-cls ‖ patches]."""
    from models.swin_transformer import SwinTransformer

    torch.manual_seed(0)
    m = SwinTransformer(
        img_size=32, patch_size=4, in_chans=3, num_classes=0, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        ape=False, patch_norm=True)
    # attn_mask / relative_position_index are structural buffers — keep
    seed_weights(m, 7, exclude=("attn_mask", "relative_position_index"))
    m.eval()
    x = torch.from_numpy(
        np.random.RandomState(8).randn(2, 3, 32, 32).astype(np.float32))
    with torch.no_grad():
        out = m(x)
    np.savez(
        os.path.join(OUT, "golden_swin.npz"),
        images=x.numpy(), out=out.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("swin fixture:", out.shape)


def make_vqkd():
    """Reference VQ-KD tokenizer (models/model_vqkd.py) tiny: encoder →
    encode_task_layer → NormEMA quantizer. encode() is called directly so
    the fixture pins the tokenizer math itself, independent of the
    pre_process input-domain quirk (models/model_vqkd.py:125-136; see
    MIGRATING.md on the normalized-input contract)."""
    from functools import partial

    import torch.nn as nn
    from models.model_vqkd import VQKD

    def cfg(**kw):
        base = dict(img_size=32, patch_size=16, in_chans=3, num_classes=0,
                    embed_dim=32, depth=1, num_heads=2, mlp_ratio=4.0,
                    qkv_bias=True, qk_scale=None, drop_rate=0.0,
                    attn_drop_rate=0.0, drop_path_rate=0.0,
                    norm_layer=partial(nn.LayerNorm, eps=1e-6),
                    init_values=0.0, use_abs_pos_emb=True,
                    use_rel_pos_bias=False, use_shared_rel_pos_bias=False,
                    use_mean_pooling=True, init_scale=0.001)
        base.update(kw)
        return base

    torch.manual_seed(0)
    m = VQKD(cfg(), cfg(img_size=2, patch_size=1, in_chans=8),
             n_embed=16, embed_dim=8, teacher_model_type="None",
             quantize_kmeans_init=False)
    # std 0.1: at 0.02 the task-layer output is nearly constant across
    # patches and every patch maps to one code — a degenerate argmin test
    seed_weights(m, 9, exclude=("quantize.",), std=0.1)
    m.eval()
    x = torch.from_numpy(
        np.random.RandomState(11).randn(2, 3, 32, 32).astype(np.float32))
    # deterministic codebook seeded AROUND the actual z rows (perturbed)
    # so the nearest-code assignment actually discriminates patches —
    # a random codebook collapses to one argmin for every patch
    g = torch.Generator().manual_seed(10)
    with torch.no_grad():
        z0 = m.encode_task_layer(m.encoder(x, return_patch_tokens=True))
        zf = z0.reshape(-1, 8)
        zf = zf / zf.norm(dim=-1, keepdim=True)
        w = torch.cat([zf + 0.2 * torch.randn(8, 8, generator=g),
                       torch.randn(8, 8, generator=g)])
        w = w / w.norm(dim=-1, keepdim=True)
        m.quantize.embedding.weight.copy_(w)
        m.quantize.embedding.embed_avg.copy_(w)
        m.quantize.embedding.cluster_size.zero_()
        m.quantize.embedding.initted.fill_(1.0)
        m.quantize.cluster_size.zero_()
    with torch.no_grad():
        # pin the pre-quantizer z as well to localize any mismatch
        ef = m.encoder(x, return_patch_tokens=True)
        z = m.encode_task_layer(ef)
        quant, ids, _ = m.encode(x)
    np.savez(
        os.path.join(OUT, "golden_vqkd.npz"),
        images=x.numpy(), z=z.numpy(),
        ids=ids.reshape(2, -1).numpy(),
        zq=quant.flatten(2).transpose(1, 2).numpy(),  # b c h w -> b (hw) c
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("vqkd fixture ids:", ids.reshape(2, -1).numpy().tolist())


def make_roberta():
    # the reference targets transformers 4.x where these lived in
    # modeling_utils; newer releases moved them to pytorch_utils
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for sym in ("apply_chunking_to_forward",
                "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, sym):
            setattr(mu, sym, getattr(pu, sym))

    from models.xroberta import RobertaConfig, RobertaForMaskedLM

    cfg = RobertaConfig(
        vocab_size=99, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=40, type_vocab_size=1, fusion_layer=2,
        encoder_width=96, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        layer_norm_eps=1e-5)  # roberta-base's released value (class default
        # is 1e-12; the shipped config.json the reference loads uses 1e-5)
    torch.manual_seed(0)
    m = RobertaForMaskedLM(cfg)
    seed_weights(m, 3)
    m.eval()
    r = np.random.RandomState(4)
    ids = r.randint(3, 99, (2, 9)).astype(np.int64)
    atts = np.ones((2, 9), np.int64)
    atts[1, 6:] = 0
    enc = r.randn(2, 5, 96).astype(np.float32)
    with torch.no_grad():
        # text-only mode (layers [0, fusion))
        text_out = m.roberta(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(atts),
            mode="text", return_dict=True).last_hidden_state
        # full multimodal pass + MLM logits with cross-attention
        mlm_out = m(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(atts),
                    encoder_hidden_states=torch.from_numpy(enc),
                    encoder_attention_mask=torch.ones(2, 5).long(),
                    return_dict=True, return_logits=True)
    np.savez(
        os.path.join(OUT, "golden_xroberta.npz"),
        ids=ids, atts=atts, enc=enc,
        text_out=text_out.numpy(), mlm_logits=mlm_out.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("xroberta fixture:", mlm_out.shape)


def _tiny_reference_xfm(tmpdir, use_mlm=True, use_bbox=True):
    """Reference XFMBase-family model at tiny size: fabricated roberta
    config dir + a monkeypatched tiny BEiT-2 vision builder (the reference's
    build_vision_encoder hardcodes base/large sizes, models/xfm.py:208-230)."""
    import json

    import models.xfm as rxfm
    from functools import partial
    import torch.nn as nn

    txtdir = os.path.join(tmpdir, "roberta-tiny")
    os.makedirs(txtdir, exist_ok=True)
    with open(os.path.join(txtdir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["RobertaForMaskedLM"], "vocab_size": 99,
            "hidden_size": 48, "num_hidden_layers": 4,
            "num_attention_heads": 4, "intermediate_size": 96,
            "max_position_embeddings": 40, "type_vocab_size": 1,
            "layer_norm_eps": 1e-5, "pad_token_id": 1, "bos_token_id": 0,
            "eos_token_id": 2, "hidden_act": "gelu",
            "model_type": "roberta"}, f)

    def tiny_vision(config, load_params=False):
        from models.beit2 import VisionTransformer

        m = VisionTransformer(
            img_size=64, patch_size=16, embed_dim=96, depth=3, num_heads=4,
            mlp_ratio=4, qkv_bias=True,
            norm_layer=partial(nn.LayerNorm, eps=1e-6), init_values=0.1,
            use_abs_pos_emb=False, use_rel_pos_bias=True,
            use_mean_pooling=True, init_scale=0.001, drop_path_rate=0.0,
            num_masking_patches=5, min_num_patches=1)
        return m, 96

    rxfm.build_vision_encoder = tiny_vision

    cfg = {
        "text_encoder": txtdir, "use_beit_v2": True,
        "vision_config": "base", "image_res": 64, "patch_size": 16,
        "local_attn_depth": -1,
        "text_num_hidden_layers": 4, "text_fusion_start_at": 4,
        "fusion_num_hidden_layers": 2, "fusion_fusion_start_at": 0,
        "embed_dim": 32, "temp": 0.07,
        "max_tokens": 9, "max_masks": 3,
    }
    model = rxfm.XFMBase(cfg, load_vision_params=False,
                         load_text_params=False, use_contrastive_loss=True,
                         use_matching_loss=True, use_mlm_loss=use_mlm,
                         use_bbox_loss=use_bbox)
    return model, cfg


def make_xfm_losses():
    """Loss-level parity fixture: ITC (plain + idx), fuse-MLM, MIM, ITM with
    recorded hard negatives, bbox L1+GIoU — from the reference XFMBase
    (models/xfm.py:624-840)."""
    import tempfile

    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            backend="gloo", init_method=f"file://{tempfile.mktemp()}",
            world_size=1, rank=0)

    tmpdir = tempfile.mkdtemp()
    model, _ = _tiny_reference_xfm(tmpdir)
    seed_weights(model, 5)
    with torch.no_grad():  # keep temp in the clamp range [0.001, 0.5]
        model.temp.fill_(0.07)
    model.eval()

    r = np.random.RandomState(6)
    B, T, M, N = 2, 9, 3, 16
    image = torch.from_numpy(r.randn(B, 3, 64, 64).astype(np.float32))
    ids = torch.from_numpy(r.randint(3, 99, (B, T)).astype(np.int64))
    atts = torch.ones(B, T, dtype=torch.long)
    atts[1, 6:] = 0
    ids_masked = torch.from_numpy(r.randint(3, 99, (B, T)).astype(np.int64))
    masked_pos = torch.from_numpy(
        np.stack([np.arange(1, M + 1)] * B).astype(np.int64))
    masked_ids = torch.from_numpy(r.randint(3, 99, (B, M)).astype(np.int64))
    mask = torch.zeros(B, N, dtype=torch.bool)
    mask[:, :5] = True
    target_bbox = torch.from_numpy(
        np.clip(r.rand(B, 4).astype(np.float32), 0.2, 0.8))
    idx = torch.tensor([7, 7])  # duplicate → idx-variant soft labels

    # pin the sampled hard negatives and record them
    neg_seq = iter([1, 0, 1, 0])  # image_neg then text_neg draws, B each
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
            # masked forward: replay our host-side mask via the mask_token
            # injection exactly as forward_avgpool does
            # (reference models/beit2.py:431-441) with bool_masked_pos
            x = model.vision_encoder.patch_embed(image)
            w = mask.unsqueeze(-1).type_as(x)
            mask_token = model.vision_encoder.mask_token.expand(
                x.shape[0], x.shape[1], -1)
            x_masked = x * (1 - w) + mask_token * w
            # manual trunk run with masked tokens (mirrors forward_avgpool,
            # reference models/beit2.py:431-466, with our recorded mask
            # replacing the internally-generated one)
            ve = model.vision_encoder
            cls = ve.cls_token.expand(x.shape[0], -1, -1)
            xm = torch.cat((cls, x_masked), dim=1)
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
            loss_itc = model.get_contrastive_loss(image_feat, text_feat)
            loss_itc_idx = model.get_contrastive_loss(image_feat, text_feat,
                                                      idx=idx)
            loss_itm = model.get_matching_loss(
                image_embeds, image_atts_t, image_feat, ids, atts,
                text_feat, text_embeds=text_embeds, is_pretrain=True)
            loss_mlm = model.get_fuse_mlm_loss(ids_masked, atts,
                                               image_embeds, image_atts_t,
                                               masked_pos, masked_ids)
            loss_mim = model.get_mim_loss(image_embeds_masked, image_embeds,
                                          mask)
            coords = model.predict_bbox(image_embeds, ids, atts,
                                        text_embeds)
            loss_bbox, loss_giou = model.get_bbox_loss(coords, target_bbox)
    finally:
        torch.multinomial = mult

    np.savez(
        os.path.join(OUT, "golden_xfm_losses.npz"),
        image=image.numpy(), ids=ids.numpy(), atts=atts.numpy(),
        ids_masked=ids_masked.numpy(), masked_pos=masked_pos.numpy(),
        masked_ids=masked_ids.numpy(), mask=mask.numpy(),
        target_bbox=target_bbox.numpy(), idx=idx.numpy(),
        image_neg=np.asarray(fixed[:2]), text_neg=np.asarray(fixed[2:]),
        loss_itc=loss_itc.item(), loss_itc_idx=loss_itc_idx.item(),
        loss_itm=loss_itm.item(), loss_mlm=loss_mlm.item(),
        loss_mim=loss_mim.item(), loss_bbox=loss_bbox.item(),
        loss_giou=loss_giou.item(), coords=coords.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in model.state_dict().items()},
    )
    print("xfm losses fixture:",
          {k: round(v.item(), 4) for k, v in dict(
              itc=loss_itc, itm=loss_itm, mlm=loss_mlm, mim=loss_mim,
              bbox=loss_bbox, giou=loss_giou).items()})


class _HFAdamW(torch.optim.Optimizer):
    """The `transformers.optimization.AdamW` the reference imports
    (reference optim.py:1,48; removed from the installed transformers),
    re-implemented from its published algorithm: Adam with bias correction
    folded into the step size (eps is added to sqrt(v) BEFORE the
    bias-correction scaling, unlike torch.optim.AdamW) and decoupled weight
    decay applied to the post-update parameter at lr·wd."""

    def __init__(self, params, lr, betas=(0.9, 0.999), eps=1e-6,
                 weight_decay=0.0, correct_bias=True):
        super().__init__(params, dict(lr=lr, betas=betas, eps=eps,
                                      weight_decay=weight_decay,
                                      correct_bias=correct_bias))

    @torch.no_grad()
    def step(self, closure=None):
        import math

        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                state = self.state[p]
                if not state:
                    state["step"] = 0
                    state["exp_avg"] = torch.zeros_like(p)
                    state["exp_avg_sq"] = torch.zeros_like(p)
                m, v = state["exp_avg"], state["exp_avg_sq"]
                b1, b2 = group["betas"]
                state["step"] += 1
                m.mul_(b1).add_(p.grad, alpha=1.0 - b1)
                v.mul_(b2).addcmul_(p.grad, p.grad, value=1.0 - b2)
                denom = v.sqrt().add_(group["eps"])
                step_size = group["lr"]
                if group["correct_bias"]:
                    step_size *= (math.sqrt(1.0 - b2 ** state["step"])
                                  / (1.0 - b1 ** state["step"]))
                p.addcdiv_(m, denom, value=-step_size)
                if group["weight_decay"] > 0.0:
                    p.add_(p, alpha=-group["lr"] * group["weight_decay"])


class _AttrDict(dict):
    """The reference's config object supports both attribute and item
    access (optim.py uses args.lr, scheduler.py uses args['...'])."""
    __getattr__ = dict.__getitem__


def make_trajectory():
    """Training-trajectory parity fixture (VERDICT r4 #2): run the
    reference's optimizer pipeline — optim.create_optimizer 4-group HF
    AdamW (reference optim.py:4-50) + scheduler.create_scheduler linear
    warmup/decay (reference scheduler.py:6-30) — for 6 steps from a shared
    init on a fixed batch, and record the per-step loss sequences:

    - 'ft': loss = ITC + ITM, bare optimizer, NO gradient clipping — the
      fine-tune contract (reference Retrieval.py:318-322 builds bare AdamW;
      model_retrieval.py:26-37 sums itc+itm);
    - 'pt': loss = ITC + ITM + MLM + MIM with clip_grad_norm 1.0 — the
      pretrain contract (reference Pretrain.py:141-247 via the apex
      accelerator's clip, apex_ddp_accelerator.py:100-110).

    Hard negatives are pinned per step (recorded draws), dropout is off
    (model.eval()); this pins the optimizer/schedule/group/clip semantics
    mechanically — the class of bug (round-4 grad-clip mismatch) that
    forward-only fixtures cannot catch."""
    import copy
    import tempfile

    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            backend="gloo", init_method=f"file://{tempfile.mktemp()}",
            world_size=1, rank=0)

    import transformers.optimization as topt

    if not hasattr(topt, "AdamW"):
        topt.AdamW = _HFAdamW
    import optim as ref_optim
    import scheduler as ref_scheduler

    tmpdir = tempfile.mkdtemp()
    model0, _ = _tiny_reference_xfm(tmpdir)
    seed_weights(model0, 11)
    with torch.no_grad():
        model0.temp.fill_(0.07)
    model0.eval()  # deterministic forward; the trajectory pins optim math

    r = np.random.RandomState(12)
    B, T, M, N = 2, 9, 3, 16
    S = 6
    image = torch.from_numpy(r.randn(B, 3, 64, 64).astype(np.float32))
    ids = torch.from_numpy(r.randint(3, 99, (B, T)).astype(np.int64))
    atts = torch.ones(B, T, dtype=torch.long)
    atts[1, 6:] = 0
    ids_masked = torch.from_numpy(r.randint(3, 99, (B, T)).astype(np.int64))
    masked_pos = torch.from_numpy(
        np.stack([np.arange(1, M + 1)] * B).astype(np.int64))
    masked_ids = torch.from_numpy(r.randint(3, 99, (B, M)).astype(np.int64))
    mask = torch.zeros(B, N, dtype=torch.bool)
    mask[:, :5] = True
    # per-step pinned negatives, off-diagonal: [S, 2, B] (image then text)
    negs = np.stack([
        np.stack([(np.arange(B) + 1 + r.randint(0, B - 1, B)) % B
                  for _ in range(2)]) for _ in range(S)])

    lr, wd, lr_mult = 1e-3, 0.01, 2.0
    sched_args = _AttrDict(sched="linear", lr=lr, weight_decay=wd,
                           lr_mult=lr_mult, num_training_steps=10,
                           num_warmup_steps=2)

    def run(loss_fn, clip):
        model = copy.deepcopy(model0)
        optimizer = ref_optim.create_optimizer(sched_args, model)
        scheduler = ref_scheduler.create_scheduler(sched_args, optimizer)
        losses, comps, norms = [], [], []
        for s in range(S):
            neg_seq = iter(list(negs[s, 0]) + list(negs[s, 1]))

            def fake_multinomial(weights, num, *a, **k):
                return torch.tensor([int(next(neg_seq))])

            mult = torch.multinomial
            torch.multinomial = fake_multinomial
            try:
                loss, parts = loss_fn(model)
            finally:
                torch.multinomial = mult
            optimizer.zero_grad()
            loss.backward()
            if clip:
                norms.append(float(torch.nn.utils.clip_grad_norm_(
                    model.parameters(), clip)))
            optimizer.step()
            scheduler.step()
            losses.append(loss.item())
            comps.append(parts)
        return (np.asarray(losses), np.asarray(comps),
                np.asarray(norms if norms else [0.0]))

    def forward_common(model):
        image_embeds, image_atts_t = model.get_vision_embeds(image)
        text_embeds = model.get_text_embeds(ids, atts)
        image_feat, text_feat = model.get_features(image_embeds, text_embeds)
        loss_itc = model.get_contrastive_loss(image_feat, text_feat)
        loss_itm = model.get_matching_loss(
            image_embeds, image_atts_t, image_feat, ids, atts, text_feat,
            text_embeds=text_embeds, is_pretrain=True)
        return image_embeds, text_embeds, image_atts_t, loss_itc, loss_itm

    def ft_loss(model):
        _, _, _, loss_itc, loss_itm = forward_common(model)
        return loss_itc + loss_itm, [loss_itc.item(), loss_itm.item()]

    def masked_vision(model):
        # mirrors forward_avgpool with our recorded mask (reference
        # models/beit2.py:431-466) — same replay as make_xfm_losses, with
        # grad enabled
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
        return torch.cat([xm_cls, patches], dim=1)

    def pt_loss(model):
        (image_embeds, _, image_atts_t, loss_itc,
         loss_itm) = forward_common(model)
        loss_mlm = model.get_fuse_mlm_loss(ids_masked, atts, image_embeds,
                                           image_atts_t, masked_pos,
                                           masked_ids)
        loss_mim = model.get_mim_loss(masked_vision(model), image_embeds,
                                      mask)
        loss = loss_itc + loss_itm + loss_mlm + loss_mim
        return loss, [loss_itc.item(), loss_itm.item(), loss_mlm.item(),
                      loss_mim.item()]

    ft_losses, ft_comps, _ = run(ft_loss, clip=None)
    pt_losses, pt_comps, pt_norms = run(pt_loss, clip=1.0)

    np.savez(
        os.path.join(OUT, "golden_trajectory.npz"),
        image=image.numpy(), ids=ids.numpy(), atts=atts.numpy(),
        ids_masked=ids_masked.numpy(), masked_pos=masked_pos.numpy(),
        masked_ids=masked_ids.numpy(), mask=mask.numpy(), negs=negs,
        lr=lr, weight_decay=wd, lr_mult=lr_mult,
        num_training_steps=sched_args["num_training_steps"],
        num_warmup_steps=sched_args["num_warmup_steps"],
        ft_losses=ft_losses, ft_comps=ft_comps,
        pt_losses=pt_losses, pt_comps=pt_comps, pt_grad_norms=pt_norms,
        **{f"sd::{k}": v.numpy() for k, v in model0.state_dict().items()},
    )
    print("trajectory fixture: ft", np.round(ft_losses, 4),
          "pt", np.round(pt_losses, 4), "norms", np.round(pt_norms, 3))


def make_decode():
    """Greedy-decode parity fixture: reference RobertaForCausalLM with
    cross-attention decodes step-by-step with past_key_values; records the
    greedy token sequence + per-step logits
    (reference models/xroberta.py:963-1153 causal decoder path)."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for sym in ("apply_chunking_to_forward",
                "find_pruneable_heads_and_indices", "prune_linear_layer"):
        if not hasattr(mu, sym):
            setattr(mu, sym, getattr(pu, sym))

    from models.xroberta import RobertaConfig, RobertaForCausalLM

    cfg = RobertaConfig(
        vocab_size=99, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=40, type_vocab_size=1, fusion_layer=0,
        encoder_width=96, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        layer_norm_eps=1e-5, is_decoder=True, add_cross_attention=True)
    torch.manual_seed(0)
    m = RobertaForCausalLM(config=cfg)
    seed_weights(m, 7)
    m.eval()

    r = np.random.RandomState(8)
    B, L = 2, 8
    enc = torch.from_numpy(r.randn(B, 5, 96).astype(np.float32))
    enc_atts = torch.ones(B, 5, dtype=torch.long)
    cur = torch.zeros(B, 1, dtype=torch.long)  # BOS
    seqs = [cur]
    step_logits = []
    past = None
    with torch.no_grad():
        for _ in range(L):
            out = m(cur, encoder_hidden_states=enc,
                    encoder_attention_mask=enc_atts, past_key_values=past,
                    use_cache=True, return_dict=True)
            logits = out.logits[:, -1, :]
            step_logits.append(logits.numpy())
            past = out.past_key_values
            cur = logits.argmax(-1, keepdim=True)
            seqs.append(cur)
    seq = torch.cat(seqs, dim=1)
    np.savez(
        os.path.join(OUT, "golden_decode.npz"),
        enc=enc.numpy(), enc_atts=enc_atts.numpy(), seq=seq.numpy(),
        step_logits=np.stack(step_logits, axis=1),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )
    print("decode fixture:", seq.numpy().tolist())


class _Interp2DShim:
    """scipy removed `interp2d` in 1.14; this is the documented bug-for-bug
    replacement (RectBivariateSpline on a regular grid, s=0) so the
    reference's `interpolate_pos_embed` (models/beit2.py:816-819) runs
    unchanged. interp2d contract: z.shape == (len(y), len(x)),
    f(dx, dy) -> (len(dy), len(dx))."""

    def __init__(self, x, y, z, kind="cubic"):
        from scipy.interpolate import RectBivariateSpline

        k = {"linear": 1, "cubic": 3, "quintic": 5}[kind]
        self._rbs = RectBivariateSpline(np.asarray(y), np.asarray(x),
                                        np.asarray(z), kx=k, ky=k, s=0)

    def __call__(self, dx, dy):
        return self._rbs(np.asarray(dy), np.asarray(dx))


def make_interpolation():
    """Value-level fixtures for the resolution-change checkpoint surgery:
    run the reference's `interpolate_pos_embed` (models/beit2.py:753-849 —
    geometric-progression rel-pos-bias resample + bicubic abs-pos-embed
    resample) at 224→384 and 224→480 on seeded tables, save inputs and
    outputs. tests/test_interpolation_golden.py pins the importer's
    `interpolate_rel_pos_bias_table` / `interpolate_abs_pos_embed` against
    these."""
    from functools import partial

    import torch.nn as nn
    from scipy import interpolate as _si

    from models.beit2 import VisionTransformer, interpolate_pos_embed

    if not getattr(_si.interp2d, "_is_shim", False):
        _Interp2DShim._is_shim = True
        _si.interp2d = _Interp2DShim

    heads, C = 4, 32
    r = np.random.RandomState(11)
    src_win = 14                       # 224px / patch16
    src_table = r.randn((2 * src_win - 1) ** 2 + 3, heads).astype(np.float32)
    src_pos = r.randn(1, 1 + src_win * src_win, C).astype(np.float32)

    save = {"src_table": src_table, "src_pos": src_pos}
    for res in (384, 480):
        dst = VisionTransformer(
            img_size=res, patch_size=16, embed_dim=C, depth=1,
            num_heads=heads, mlp_ratio=4, qkv_bias=True,
            norm_layer=partial(nn.LayerNorm, eps=1e-6), init_values=0.1,
            use_abs_pos_emb=True, use_rel_pos_bias=True,
            use_mean_pooling=True, drop_path_rate=0.0)
        ckpt = {
            "blocks.0.attn.relative_position_bias_table":
                torch.from_numpy(src_table.copy()),
            "blocks.0.attn.relative_position_index":
                torch.zeros(1, dtype=torch.long),  # popped by the reference
            "pos_embed": torch.from_numpy(src_pos.copy()),
        }
        out = interpolate_pos_embed(dst, ckpt)
        save[f"table_{res}"] = \
            out["blocks.0.attn.relative_position_bias_table"].numpy()
        save[f"pos_{res}"] = out["pos_embed"].numpy()
        print(f"interpolation fixture {res}px:",
              save[f"table_{res}"].shape, save[f"pos_{res}"].shape)
    np.savez(os.path.join(OUT, "golden_interpolation.npz"), **save)


def main():
    os.makedirs(OUT, exist_ok=True)
    install_stubs()
    sys.path.insert(0, "/root/reference")
    make_beit()
    make_roberta()
    make_xfm_losses()
    make_trajectory()
    make_decode()
    make_clip_vit()
    make_swin()
    make_vqkd()
    make_interpolation()


if __name__ == "__main__":
    main()
