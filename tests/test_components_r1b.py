"""Tests for the round-1 gap-closing components: METEOR, DeiT backbone,
CLIP-ViT local-attention region mode, encoder-state cycling, attention-remat
gradient equivalence, and the fused full+masked vision pass."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xfm_tpu.eval.meteor import meteor, meteor_sentence, porter_stem


# ---------------------------------------------------------------- METEOR

def test_porter_stem_classic_cases():
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("running") == "run"
    assert porter_stem("agreed") == "agre"
    assert porter_stem("sky") == "sky"


def test_meteor_identical_is_near_one():
    s = "a man riding a horse on the beach"
    assert meteor_sentence(s, [s]) > 0.99


@pytest.mark.slow
def test_meteor_orders_by_quality():
    refs = {"1": ["a cat sits on the mat"]}
    good = meteor({"1": "a cat sits on the mat"}, refs)
    ok = meteor({"1": "a cat sitting on a mat"}, refs)       # stem matches
    bad = meteor({"1": "completely unrelated words entirely"}, refs)
    assert good > ok > bad
    assert bad == 0.0


def test_meteor_penalty_for_fragmentation():
    refs = ["the quick brown fox jumps over the lazy dog"]
    contiguous = meteor_sentence("the quick brown fox", refs)
    scrambled = meteor_sentence("fox brown the quick", refs)
    assert contiguous > scrambled


def test_meteor_synonym_stage_matches():
    """Synonym-stage words (shared synset group) align like the jar's
    WordNet module: 'photo'≈'picture', 'couch'≈'sofa'."""
    refs = ["a picture of a sofa in a living room"]
    with_syn = meteor_sentence("a photo of a couch in a living room", refs)
    without = meteor_sentence("a xyzzy of a qwrt in a living room", refs)
    exact = meteor_sentence("a picture of a sofa in a living room", refs)
    assert with_syn == pytest.approx(exact)  # synonym matches count fully
    assert with_syn > without


def test_meteor_synonym_stage_ranks_below_unrelated_mismatch():
    from xfm_tpu.eval.meteor_synonyms import synset_ids

    assert synset_ids("kid") & synset_ids("child")
    assert not (synset_ids("dog") & synset_ids("cat"))
    assert synset_ids("nonexistentword") == frozenset()


# ------------------------------------------------------------------ DeiT

@pytest.mark.slow
def test_deit_forward_and_gradcam_gate():
    from xfm_tpu.models.deit import DeitConfig, DeitVisionTransformer

    cfg = DeitConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                     num_heads=2)
    m = DeitVisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), imgs)
    out = m.apply(params, imgs)
    assert out.shape == (2, 1 + cfg.num_patches, 32)

    # GradCAM surface: grad wrt a ones prob_gate on block 1 is nonzero and
    # has the attention-map shape
    N = 1 + cfg.num_patches
    gate = jnp.ones((2, cfg.num_heads, N, N))

    def f(g):
        o = m.apply(params, imgs, register_blk=1, prob_gate=g)
        return jnp.sum(o ** 2)

    grads = jax.grad(f)(gate)
    assert grads.shape == gate.shape
    assert float(jnp.max(jnp.abs(grads))) > 0


# ------------------------------------------- CLIP local-attention region mode

@pytest.mark.slow
def test_clip_local_attn_region_mode():
    from xfm_tpu.models.clip_vit import (ClipVisionConfig,
                                         ClipVisionTransformer)

    cfg = ClipVisionConfig(image_res=32, patch_size=16, hidden_size=32,
                           num_hidden_layers=3, num_attention_heads=2,
                           intermediate_size=64, local_attn_depth=2)
    m = ClipVisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), imgs)

    # 3 regions over 2 images
    idx = jnp.asarray([0, 0, 1], jnp.int32)
    N = 1 + cfg.num_patches
    atts = np.ones((3, N), np.float32)
    atts[0, 3:] = 0.0  # region 0 sees only cls + first 2 patches
    region, full = m.apply(params, imgs, idx_to_group_img=idx,
                           image_atts=jnp.asarray(atts))
    assert region.shape == (3, N, 32)
    assert full.shape == (2, N, 32)

    # masking a different patch subset must change the region output
    atts2 = np.ones((3, N), np.float32)
    atts2[0, 1:3] = 0.0
    region2, _ = m.apply(params, imgs, idx_to_group_img=idx,
                         image_atts=jnp.asarray(atts2))
    assert not np.allclose(np.asarray(region[0]), np.asarray(region2[0]))
    # region 2 (full atts) must equal the full row of image 1 through the
    # local layers (same mask, same input)
    np.testing.assert_allclose(np.asarray(region[2]), np.asarray(full[1]),
                               atol=1e-5)


# ----------------------------------------------- encoder-state list cycling

def test_encoder_states_list_cycling():
    from xfm_tpu.models.text_encoder import TextConfig, TextTransformer

    cfg = TextConfig.roberta_base(vocab_size=64, hidden_size=32,
                                  num_hidden_layers=2, num_attention_heads=2,
                                  intermediate_size=64, fusion_layer=0,
                                  encoder_width=32)
    m = TextTransformer(cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    enc_a = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    enc_b = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 32))
    params = m.init(jax.random.PRNGKey(2), ids,
                    encoder_hidden_states=enc_a,
                    method=TextTransformer.init_all)

    out_ab = m.apply(params, ids, encoder_hidden_states=[enc_a, enc_b])
    out_aa = m.apply(params, ids, encoder_hidden_states=[enc_a, enc_a])
    out_a = m.apply(params, ids, encoder_hidden_states=enc_a)
    # [a, a] cycling == plain a; [a, b] differs
    np.testing.assert_allclose(np.asarray(out_aa), np.asarray(out_a),
                               atol=1e-5)
    assert not np.allclose(np.asarray(out_ab), np.asarray(out_a), atol=1e-4)


# ------------------------------------------------- attention remat equivalence

@pytest.mark.slow
def test_attn_remat_grad_equivalence(monkeypatch):
    from xfm_tpu.ops import attention as A

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 2, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 2, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 2, 8))
    bias = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 9, 9))

    def loss(q):
        return jnp.sum(A.dot_product_attention(q, k, v, bias=bias) ** 2)

    A._attn_remat.cache_clear()
    monkeypatch.setenv("XFM_ATTN_REMAT", "0")
    g0 = jax.grad(loss)(q)
    A._attn_remat.cache_clear()
    monkeypatch.setenv("XFM_ATTN_REMAT", "1")
    g1 = jax.grad(loss)(q)
    A._attn_remat.cache_clear()
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)


# ------------------------------------------------------- fused vision pair

@pytest.mark.slow
def test_vision_pair_matches_two_passes():
    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig

    cfg = VisionConfig(image_res=32, patch_size=16, embed_dim=32, depth=2,
                       num_heads=2, drop_path_rate=0.0)
    m = BeitVisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 32, 3))
    mask = jax.random.bernoulli(jax.random.PRNGKey(1),
                                0.4, (3, cfg.num_patches))
    params = m.init(jax.random.PRNGKey(2), imgs)
    full1 = m.apply(params, imgs)
    masked1 = m.apply(params, imgs, mask=mask)
    full2, masked2 = m.apply(params, imgs, mask,
                             method=BeitVisionTransformer.pair)
    np.testing.assert_allclose(np.asarray(full1), np.asarray(full2),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(masked1), np.asarray(masked2),
                               atol=1e-5)


def test_beit_local_attn_region_mode():
    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig

    cfg = VisionConfig(image_res=32, patch_size=16, embed_dim=32, depth=3,
                       num_heads=2, drop_path_rate=0.0, local_attn_depth=2)
    m = BeitVisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), imgs)

    idx = jnp.asarray([0, 0, 1], jnp.int32)
    N = 1 + cfg.num_patches
    atts = np.ones((3, N), np.float32)
    atts[0, 3:] = 0.0
    region, full = m.apply(params, imgs, idx_to_group_img=idx,
                           image_atts=jnp.asarray(atts))
    assert region.shape == (3, N, 32)
    assert full.shape == (2, N, 32)
    # full-attention region row equals the full row of its source image
    np.testing.assert_allclose(np.asarray(region[2]), np.asarray(full[1]),
                               atol=1e-5)
    # masked region differs from the full row
    assert not np.allclose(np.asarray(region[0]), np.asarray(full[0]),
                           atol=1e-4)


def test_top_k_top_p_filtering():
    from xfm_tpu.models.generation import top_k_top_p_filtering

    logits = jnp.asarray([[2.0, 1.0, 0.5, 0.1, -1.0]])
    out = top_k_top_p_filtering(logits, top_k=2)
    keep = np.isfinite(np.asarray(out)) & (np.asarray(out) > -1e30)
    assert keep.tolist() == [[True, True, False, False, False]]

    # top_p: keep smallest prefix of sorted probs whose *preceding* mass < p
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    out = top_k_top_p_filtering(logits, top_p=float(probs[0]) + 1e-4)
    keep = np.asarray(out)[0] > -1e30
    assert keep.tolist() == [True, True, False, False, False]
    # p below the top token's prob still keeps the top token
    out = top_k_top_p_filtering(logits, top_p=1e-6)
    keep = np.asarray(out)[0] > -1e30
    assert keep.tolist() == [True, False, False, False, False]
    # renormalized distribution only over kept tokens
    out = top_k_top_p_filtering(logits, top_k=3, top_p=1.0)
    p = np.asarray(jax.nn.softmax(out, -1))[0]
    np.testing.assert_allclose(p[3:], 0.0, atol=1e-6)


def test_probe_dataset_layouts(tmp_path):
    import h5py
    from xfm_tpu.data.probe_datasets import load_probe_split
    from xfm_tpu.data.transforms import decode_image

    # npz layout
    root = tmp_path / "cifar10"
    root.mkdir()
    imgs = np.random.randint(0, 255, (8, 32, 32, 3), np.uint8)
    labels = np.arange(8) % 10
    np.savez(root / "test.npz", images=imgs, labels=labels)
    rows, nc = load_probe_split("cifar10", str(root), "test")
    assert nc == 10 and len(rows) == 8
    im = decode_image(rows[0][0])
    assert im.size == (32, 32)

    # fer2013 h5 layout (grayscale 48x48)
    r2 = tmp_path / "fer"
    r2.mkdir()
    with h5py.File(r2 / "fer2013.h5", "w") as f:
        g = f.create_group("test")
        g["images"] = np.random.randint(0, 255, (4, 48, 48), np.uint8)
        g["labels"] = np.asarray([0, 1, 2, 3])
    rows, nc = load_probe_split("fer2013", str(r2), "test")
    assert nc == 7 and len(rows) == 4
    assert decode_image(rows[1][0]).mode == "RGB"

    # class-folder tree
    r3 = tmp_path / "dtd"
    for c in ("banded", "dotted"):
        (r3 / "test" / c).mkdir(parents=True)
        from PIL import Image

        Image.fromarray(imgs[0]).save(r3 / "test" / c / "a.jpg")
    rows, nc = load_probe_split("dtd", str(r3), "test")
    assert nc == 47 and len(rows) == 2 and rows[0][1] == 0


def test_io_fetch_many_and_glob(tmp_path):
    from xfm_tpu.data import io as xio

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        (src / f"part{i}.txt").write_text(str(i))
    hits = xio.glob_files(str(src / "part*.txt"))
    assert len(hits) == 3
    assert xio.glob_files(str(src / "nope*.bin")) == []
    out = xio.fetch_many(hits, str(tmp_path / "dst"), num_threads=2)
    assert [open(p).read() for p in out] == ["0", "1", "2"]


@pytest.mark.slow
def test_cross_kv_row_idx_matches_gathered_states():
    """Projecting cross k/v from unique rows + in-layer gather must equal
    running the fusion encoder on pre-gathered encoder states."""
    from xfm_tpu.models.text_encoder import TextConfig, TextTransformer

    cfg = TextConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     fusion_layer=0, encoder_width=32,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    m = TextTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (6, 7), 3, 60)
    atts = jnp.ones((6, 7), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 32))
    idx = jnp.asarray([2, 0, 1, 1, 2, 0], jnp.int32)
    params = m.init(jax.random.PRNGKey(2), ids, attention_mask=atts,
                    encoder_hidden_states=enc[idx],
                    method=TextTransformer.init_all)

    ref = m.apply(params, ids, attention_mask=atts,
                  encoder_hidden_states=jnp.take(enc, idx, axis=0))
    out = m.apply(params, ids, attention_mask=atts,
                  encoder_hidden_states=enc, encoder_row_idx=idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients wrt the unique encoder states also agree (gather transpose
    # = scatter-add)
    def loss_ref(enc):
        return jnp.sum(m.apply(params, ids, attention_mask=atts,
                               encoder_hidden_states=jnp.take(
                                   enc, idx, axis=0)) ** 2)

    def loss_idx(enc):
        return jnp.sum(m.apply(params, ids, attention_mask=atts,
                               encoder_hidden_states=enc,
                               encoder_row_idx=idx) ** 2)

    g1 = jax.grad(loss_ref)(enc)
    g2 = jax.grad(loss_idx)(enc)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


@pytest.mark.slow
def test_fused_itm_mlm_matches_separate_passes():
    """get_matching_and_fuse_mlm_loss (one 4B-row fusion pass, default on)
    must be loss-identical to get_matching_loss + get_fuse_mlm_loss given
    the same hard-negative rng."""
    from xfm_tpu.models import XFMConfig, config_from_yaml
    from xfm_tpu.models.xfm import XFMBase

    cfg = config_from_yaml(
        dict(image_res=32, patch_size=16, vision_embed_dim=32,
             vision_depth=2, vision_num_heads=2,
             text_encoder="roberta-base", text_num_hidden_layers=2,
             text_fusion_start_at=2, fusion_num_hidden_layers=2,
             fusion_fusion_start_at=0, text_hidden_size=32,
             text_num_attention_heads=2, text_intermediate_size=64,
             embed_dim=16, vocab_size=64),
        use_contrastive_loss=True, use_matching_loss=True,
        use_mlm_loss=True)
    m = XFMBase(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, M = 4, 7, 3
    images = jax.random.normal(rng, (B, 32, 32, 3))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 3, 60)
    atts = jnp.ones((B, T), jnp.int32)
    ids_m = jax.random.randint(jax.random.PRNGKey(2), (B, T), 3, 60)
    mpos = jnp.tile(jnp.arange(M)[None], (B, 1))
    mids = jax.random.randint(jax.random.PRNGKey(3), (B, M), 3, 60)

    params = m.init({"params": jax.random.PRNGKey(4)}, images, ids, atts,
                    method=XFMBase.init_all)["params"]

    def both(mod):
        img = mod.get_vision_embeds(images, deterministic=True)
        iatts = jnp.ones(img.shape[:2], jnp.int32)
        txt = mod.get_text_embeds(ids, atts, True)
        img_f, txt_f = mod.get_features(img, txt)
        hrng = jax.random.PRNGKey(7)
        fused = mod.get_matching_and_fuse_mlm_loss(
            hrng, img, iatts, img_f, ids, atts, txt_f, txt, ids_m, mpos,
            mids, deterministic=True)
        sep_itm = mod.get_matching_loss(hrng, img, iatts, img_f, ids, atts,
                                        txt_f, text_embeds=txt,
                                        deterministic=True)
        sep_mlm = mod.get_fuse_mlm_loss(ids_m, atts, img, iatts, mpos,
                                        mids, deterministic=True)
        return fused, (sep_itm, sep_mlm)

    (f_itm, f_mlm), (s_itm, s_mlm) = m.apply({"params": params},
                                             method=both)
    np.testing.assert_allclose(float(f_itm), float(s_itm), atol=1e-5)
    np.testing.assert_allclose(float(f_mlm), float(s_mlm), atol=1e-5)


def test_beit_intermediate_layers():
    """intermediate_layers (reference models/beit2.py:483-536): one patch
    tensor per requested block; the last block's normalized patches equal
    the standard forward's patch outputs."""
    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig

    cfg = VisionConfig(image_res=32, patch_size=16, embed_dim=32, depth=3,
                       num_heads=2, drop_path_rate=0.0)
    m = BeitVisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), imgs)

    outs = m.apply(params, imgs,
                   method=BeitVisionTransformer.intermediate_layers)
    assert len(outs) == 3
    assert all(o.shape == (2, cfg.num_patches, 32) for o in outs)

    subset = m.apply(params, imgs, layer_ids=[1],
                     method=BeitVisionTransformer.intermediate_layers)
    assert len(subset) == 1
    np.testing.assert_allclose(np.asarray(subset[0]), np.asarray(outs[1]),
                               atol=1e-6)

    # fc_norm(last block patches) == forward's patch tokens
    fc = params["params"]["fc_norm"]
    normed = (outs[-1] - outs[-1].mean(-1, keepdims=True)) / jnp.sqrt(
        outs[-1].var(-1, keepdims=True) + 1e-6) * fc["scale"] + fc["bias"]
    full = m.apply(params, imgs)
    np.testing.assert_allclose(np.asarray(normed),
                               np.asarray(full[:, 1:, :]), atol=1e-5)


def test_deit_backbone_through_xfm_base():
    """use_deit reaches the model through XFMBase.get_vision_embeds, which
    always passes idx_to_group_img/image_atts kwargs — the backbone must
    accept them (round-2 review: it crashed with TypeError, so the opt-in
    path was dead on arrival)."""
    import jax
    import jax.numpy as jnp

    from xfm_tpu.models import XFMBase, config_from_yaml

    cfg = config_from_yaml(dict(
        use_deit=True, image_res=32, patch_size=16,
        _vision={"vision_width": 32, "num_hidden_layers": 1,
                 "num_attention_heads": 2},
        text_encoder="roberta-base", text_num_hidden_layers=1,
        text_fusion_start_at=1, fusion_num_hidden_layers=1,
        fusion_fusion_start_at=0, text_hidden_size=32,
        text_num_attention_heads=2, text_intermediate_size=64,
        embed_dim=16))
    model = XFMBase(cfg)
    images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    out, params = model.init_with_output(
        jax.random.PRNGKey(0), images, method=XFMBase.get_vision_embeds)
    assert out.shape == (2, 5, 32)  # cls + 4 patches

    # MIM mask / region mode are rejected loudly (reference models/vit.py
    # has neither), not silently ignored
    import pytest

    with pytest.raises(NotImplementedError):
        model.apply(params, images, mask=jnp.ones((2, 4), jnp.int32),
                    method=XFMBase.get_vision_embeds)
