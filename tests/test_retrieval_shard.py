"""Process-sharded retrieval rerank (reference Retrieval.py:135-178): the
union of per-process row slices equals the full single-process rerank."""
import jax
import jax.numpy as jnp
import numpy as np

from xfm_tpu.models import XFMForRetrieval, config_from_yaml
from xfm_tpu.tasks.retrieval import rerank_scores


def _tiny_retrieval():
    ycfg = {"compute_dtype": "float32",
            "vision_embed_dim": 32, "vision_depth": 1, "vision_num_heads": 2,
            "patch_size": 16, "image_res": 32,
            "text_num_hidden_layers": 1, "fusion_num_hidden_layers": 1,
            "text_hidden_size": 32, "text_num_attention_heads": 2,
            "text_intermediate_size": 64, "text_vocab_size": 64,
            "embed_dim": 16}
    mcfg = config_from_yaml(ycfg, use_contrastive_loss=True,
                            use_matching_loss=True)
    model = XFMForRetrieval(mcfg)
    r = np.random.RandomState(0)
    T = 8
    images = jnp.asarray(r.randn(2, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(r.randint(3, 63, (2, T)), jnp.int32)
    atts = jnp.ones((2, T), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                        atts, method=XFMForRetrieval.init_all)["params"]
    return model, params, T


def test_row_sliced_rerank_matches_full():
    model, params, T = _tiny_retrieval()
    r = np.random.RandomState(1)
    n_img, n_txt = 5, 7
    img_embeds = []
    for i in range(n_img):
        e, _ = model.apply({"params": params}, jnp.asarray(
            r.randn(1, 32, 32, 3), jnp.float32),
            method=XFMForRetrieval.encode_images)
        img_embeds.append(np.asarray(e)[0])
    img_embeds = np.stack(img_embeds)
    txt_ids = r.randint(3, 63, (n_txt, T)).astype(np.int32)
    txt_atts = np.ones((n_txt, T), np.int32)
    txt_embeds, _ = model.apply({"params": params}, jnp.asarray(txt_ids),
                                jnp.asarray(txt_atts),
                                method=XFMForRetrieval.encode_texts)
    txt_embeds = np.asarray(txt_embeds)
    sims = r.randn(n_img, n_txt).astype(np.float32)
    k = 3

    full_i2t, full_t2i = rerank_scores(model, params, img_embeds, txt_embeds,
                                       txt_atts, sims, k,
                                       process_index=0, process_count=1)
    # simulate 2 processes: stride rows, combine with merge_rerank_scores'
    # sum + un-shift (exact even for logits below the -100 fill)
    parts = [rerank_scores(model, params, img_embeds, txt_embeds, txt_atts,
                           sims, k, process_index=p, process_count=2)
             for p in range(2)]
    merged_i2t = parts[0][0] + parts[1][0] + 100.0
    merged_t2i = parts[0][1] + parts[1][1] + 100.0

    np.testing.assert_allclose(merged_i2t, full_i2t, atol=1e-5)
    np.testing.assert_allclose(merged_t2i, full_t2i, atol=1e-5)
    # each process touched only its stride
    assert (parts[0][0][1] == -100).all() and (parts[1][0][0] == -100).all()

    # sum+un-shift reconstructs EXACTLY, even a genuine logit < -100
    # (an elementwise max against the other process' -100 fill would clamp)
    owner = np.full((2, 4), -100.0, np.float32)
    owner[0, :2] = [-150.0, 3.5]          # row 0 owned here
    other = np.full((2, 4), -100.0, np.float32)
    other[1, 1:3] = [7.0, -120.0]         # row 1 owned there
    merged = owner + other + 100.0
    np.testing.assert_allclose(merged[0], [-150.0, 3.5, -100.0, -100.0])
    np.testing.assert_allclose(merged[1], [-100.0, 7.0, -120.0, -100.0])


def test_itm_scores_grouped_matches_repeat():
    """Grouped-batch rerank (image_group_size) must equal the repeat
    formulation: the k_test candidates of each unique image are contiguous,
    cross-attention views them per group against per-unique k/v."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xfm_tpu.models.task_models import XFMForRetrieval
    from test_golden_parity import _xfm_losses_config

    cfg = _xfm_losses_config()
    model = XFMForRetrieval(cfg)
    r = np.random.RandomState(0)
    U, gs, T = 2, 3, 7
    Nv = cfg.vision.num_patches + 1
    C = cfg.vision.embed_dim
    img = jnp.asarray(r.randn(U, Nv, C), jnp.float32)
    txt = jnp.asarray(r.randn(U * gs, T, 48), jnp.float32)
    atts = jnp.ones((U * gs, T), jnp.int32)
    images = jnp.asarray(r.randn(2, cfg.vision.image_res,
                                 cfg.vision.image_res, 3), jnp.float32)
    ids = jnp.ones((2, T), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images, ids,
                        jnp.ones((2, T), jnp.int32),
                        method=XFMForRetrieval.init_all)["params"]

    ref = model.apply({"params": params}, jnp.repeat(img, gs, axis=0), txt,
                      atts, method=XFMForRetrieval.itm_scores)
    got = model.apply({"params": params}, img, txt, atts,
                      image_group_size=gs,
                      method=XFMForRetrieval.itm_scores)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)
