"""Pipelined BEiT vision tower (core/pipeline.py pipelined_beit_forward —
the beit2-large pp consumer, VERDICT r4 #7): equivalence vs the plain
forward, gradient flow through the staged blocks, and the imagenet task
consuming parallel.pipe end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xfm_tpu.core.mesh import make_mesh
from xfm_tpu.core.pipeline import pipelined_beit_forward
from xfm_tpu.models.beit2 import BeitVisionTransformer, VisionConfig


def _tiny_vcfg(depth=8, res=32):
    return VisionConfig(image_res=res, patch_size=8, embed_dim=32,
                        depth=depth, num_heads=4, drop_path_rate=0.0,
                        init_values=0.1, use_rel_pos_bias=True,
                        use_abs_pos_emb=False, use_mean_pooling=True)


@pytest.fixture(scope="module")
def tower():
    cfg = _tiny_vcfg()
    model = BeitVisionTransformer(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).randn(8, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, images)["params"]
    return cfg, model, params, images


def test_pipelined_beit_matches_plain_forward(tower):
    cfg, model, params, images = tower
    ref = model.apply({"params": params}, images)
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=1, tensor=1, pipe=4)
    with mesh:
        out = pipelined_beit_forward(params, cfg, images, mesh,
                                     num_microbatches=4,
                                     data_axes=("data",))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_pipelined_beit_gradients_flow(tower):
    """Backward through the GPipe schedule: grads wrt every staged block's
    params are nonzero and match the plain forward's grads."""
    cfg, model, params, images = tower
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=1, tensor=1, pipe=4)

    def loss_pp(p):
        with mesh:
            out = pipelined_beit_forward(p, cfg, images, mesh,
                                         num_microbatches=4,
                                         data_axes=("data",))
        return jnp.mean(out ** 2)

    def loss_plain(p):
        out = model.apply({"params": p}, images)
        return jnp.mean(out ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_plain)(params)
    for i in range(cfg.depth):
        leaf_pp = g_pp[f"block_{i}"]["fc1"]["kernel"]
        leaf_ref = g_ref[f"block_{i}"]["fc1"]["kernel"]
        assert float(jnp.abs(leaf_pp).max()) > 0
        np.testing.assert_allclose(np.asarray(leaf_pp),
                                   np.asarray(leaf_ref), atol=2e-5,
                                   rtol=2e-4)


def test_pipelined_beit_rejects_uneven_stages(tower):
    cfg, model, params, images = tower
    mesh = make_mesh(jax.devices()[:6], data=2, fsdp=1, tensor=1, pipe=3)
    with pytest.raises(ValueError, match="divisible"):
        pipelined_beit_forward(params, cfg, images, mesh,
                               num_microbatches=4)


@pytest.mark.slow
def test_imagenet_task_consumes_pipe(tmp_path):
    """run.py --task imagenet with parallel.pipe=4: train one epoch of the
    pipelined vision path + pipelined eval on synthetic data."""
    import yaml
    from PIL import Image

    from run import build_parser
    from xfm_tpu.tasks import imagenet

    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for cls in range(2):
            d = tmp_path / split / f"class{cls}"
            d.mkdir(parents=True)
            for i in range(8 if split == "train" else 3):
                arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")
    cfg = dict(
        train_root=str(tmp_path / "train"), val_root=str(tmp_path / "val"),
        image_res=32, patch_size=8, use_beit_v2=True,
        vision_embed_dim=32, vision_depth=8, vision_num_heads=4,
        drop_path_rate=0.0,
        text_hidden_size=32, text_num_hidden_layers=1,
        text_fusion_start_at=1, fusion_num_hidden_layers=1,
        text_vocab_size=64, embed_dim=16,
        batch_size=8, mixup=0.0, cutmix=0.0, reprob=0.0,
        schedular=dict(epochs=1), optimizer=dict(lr=1e-3),
        parallel=dict(pipe=4, data=2, microbatches=4),
    )
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    args = build_parser().parse_args(
        ["--task", "imagenet", "--config", str(cfg_path),
         "--output_dir", str(tmp_path / "out")])
    metrics = imagenet.main(args)
    assert "best_acc1" in metrics and 0.0 <= metrics["best_acc1"] <= 1.0
