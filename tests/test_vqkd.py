"""VQ-KD tokenizer tests (reference models/model_vqkd.py,
norm_ema_quantizer.py behavior)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from xfm_tpu.models.beit2 import VisionConfig
from xfm_tpu.models.vqkd import VQKD, VQKDConfig, NormEMAQuantizer, l2norm


def tiny_vqkd():
    enc = VisionConfig(image_res=32, patch_size=16, embed_dim=32, depth=1,
                       num_heads=2, init_values=0.0, use_rel_pos_bias=False,
                       use_shared_rel_pos_bias=True, use_abs_pos_emb=True,
                       use_mean_pooling=False, drop_path_rate=0.0)
    return VQKDConfig(encoder=enc, decoder_depth=1, codebook_size=16,
                      codebook_dim=8, teacher_dim=12)


def test_quantizer_roundtrip_and_ema():
    q = NormEMAQuantizer(num_codes=8, code_dim=4, decay=0.5)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    vars0 = q.init(jax.random.PRNGKey(1), z)
    (zq, loss, ids), new_vars = q.apply(vars0, z, update_ema=True,
                                        mutable=["vq_stats"])
    assert zq.shape == z.shape
    assert ids.shape == (2, 3)
    assert float(loss) >= 0
    # codebook rows stay unit-norm
    cb = np.asarray(new_vars["vq_stats"]["codebook"])
    np.testing.assert_allclose(np.linalg.norm(cb, axis=-1), 1.0, atol=1e-5)
    # ids consistent with nearest-neighbor of normalized input
    zn = np.asarray(l2norm(z))
    cb0 = np.asarray(vars0["vq_stats"]["codebook"])
    d = ((zn.reshape(-1, 4)[:, None] - cb0[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(ids).reshape(-1), d.argmin(-1))


def test_vqkd_tokenize_and_train_step():
    cfg = tiny_vqkd()
    model = VQKD(cfg)
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    teacher = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 12))
    variables = model.init(jax.random.PRNGKey(2), images, teacher)
    ids = model.apply(variables, images,
                      method=VQKD.get_codebook_indices)
    assert ids.shape == (2, 4)
    assert int(ids.max()) < 16
    (loss, aux), new_vars = model.apply(variables, images, teacher,
                                        mutable=["vq_stats"])
    assert np.isfinite(float(loss))
    assert float(aux["rec_loss"]) >= 0
    # tokenize is deterministic given params
    ids2 = model.apply(variables, images, method=VQKD.get_codebook_indices)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_teachers_run():
    import jax
    import jax.numpy as jnp

    from xfm_tpu.models.clip_vit import ClipVisionConfig
    from xfm_tpu.models.teachers import (CLIPTeacher, DINOTeacher,
                                         teacher_features, renormalize)

    images = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    clip_cfg = ClipVisionConfig(image_res=32, patch_size=16, hidden_size=16,
                                num_hidden_layers=1, num_attention_heads=2,
                                intermediate_size=32)
    t = CLIPTeacher(clip_cfg, proj_dim=8)
    v = t.init(jax.random.PRNGKey(1), images)
    feats = teacher_features(t, v, images)
    assert feats.shape == (2, 4, 8)

    d = DINOTeacher(image_res=32)
    # tiny: override via dataclass replace is awkward; just check the config
    from xfm_tpu.models.teachers import dino_vit_base

    cfg = dino_vit_base(32)
    assert cfg.use_abs_pos_emb and not cfg.use_rel_pos_bias
    assert cfg.init_values == 0.0

    # renormalize roundtrip
    import numpy as np

    from xfm_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3))
    y = renormalize(x, CLIP_MEAN, CLIP_STD, CLIP_MEAN, CLIP_STD)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_beit_block_no_layerscale_when_zero_init():
    import jax
    import jax.numpy as jnp

    from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig

    cfg = VisionConfig(image_res=32, patch_size=16, embed_dim=16, depth=1,
                       num_heads=2, init_values=0.0, use_rel_pos_bias=False,
                       use_abs_pos_emb=True, use_mean_pooling=False,
                       drop_path_rate=0.0)
    m = BeitVisionTransformer(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))["params"]
    assert "gamma_1" not in p["block_0"]
    out = m.apply({"params": p}, jnp.ones((2, 32, 32, 3)))
    # without LayerScale the blocks actually transform the input
    assert float(jnp.std(out)) > 0
