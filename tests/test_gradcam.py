"""GradCAM grounding test: cam is nonnegative, text-mask-aware, and equals
attn ⊙ relu(grad) by construction."""
import numpy as np
import jax
import jax.numpy as jnp

from xfm_tpu.models import XFMForRetrieval
from xfm_tpu.models.gradcam import itm_gradcam, rank_boxes_by_cam
from tests.test_sharding import tiny_cfg
import pytest


@pytest.mark.slow
def test_itm_gradcam_shapes_and_positivity():
    cfg = tiny_cfg()
    model = XFMForRetrieval(cfg)
    B, T = 2, 8
    images = jax.random.normal(jax.random.PRNGKey(0), (B, 32, 32, 3))
    ids = jnp.asarray(
        np.random.RandomState(0).randint(3, 999, (B, T)), jnp.int32)
    atts = jnp.ones((B, T), jnp.int32).at[:, 6:].set(0)
    params = model.init({"params": jax.random.PRNGKey(1)}, images, ids,
                        atts, method=XFMForRetrieval.init_all)["params"]
    cam = itm_gradcam(model, params, images, ids, atts, block_num=1)
    assert cam.shape == (B, 4)  # 32/16 grid → 4 patches
    assert np.all(np.asarray(cam) >= 0)
    assert np.any(np.asarray(cam) > 0)

    scores = rank_boxes_by_cam(cam[0], [[0, 0, 16, 16], [16, 16, 32, 32]],
                               image_res=32, patch_size=16)
    assert scores.shape == (2,)
