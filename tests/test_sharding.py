"""SPMD tests on the 8-virtual-device CPU mesh (SURVEY.md §4.3): GSPMD
contrastive semantics, param sharding rules, and the full sharded train step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from xfm_tpu.core.mesh import make_mesh, shard_batch, batch_sharding
from xfm_tpu.core.partitioning import param_shardings, validated_specs
from xfm_tpu.models import (TextConfig, VisionConfig, XFMConfig,
                            XFMForPretrain)
from xfm_tpu.models.losses import contrastive_loss


def tiny_cfg():
    vis = VisionConfig(image_res=32, patch_size=16, embed_dim=64, depth=2,
                       num_heads=4, drop_path_rate=0.0)
    txt = TextConfig.roberta_base(hidden_size=64, num_hidden_layers=2,
                                  num_attention_heads=4,
                                  intermediate_size=128, vocab_size=1000,
                                  fusion_layer=2, encoder_width=64)
    fus = TextConfig.roberta_base(hidden_size=64, num_hidden_layers=2,
                                  num_attention_heads=4,
                                  intermediate_size=128, vocab_size=1000,
                                  fusion_layer=0, encoder_width=64)
    return XFMConfig(vision=vis, text=txt, fusion=fus, embed_dim=32,
                     use_contrastive_loss=True, use_matching_loss=True,
                     use_mlm_loss=True, use_bbox_loss=True)


def make_batch(B=8, T=12, M=3, seed=0):
    r = np.random.RandomState(seed)
    return dict(
        images=jnp.asarray(r.randn(B, 32, 32, 3), jnp.float32),
        text_ids=jnp.asarray(r.randint(3, 999, (B, T)), jnp.int32),
        text_atts=jnp.ones((B, T), jnp.int32),
        text_ids_masked=jnp.asarray(r.randint(3, 999, (B, T)), jnp.int32),
        masked_pos=jnp.tile(jnp.arange(M, dtype=jnp.int32)[None], (B, 1)),
        masked_ids=jnp.asarray(r.randint(3, 999, (B, M)), jnp.int32),
        image_mask=jnp.asarray(r.rand(B, 4) < 0.5),
    )


def test_contrastive_global_batch_semantics(eight_devices):
    """Sharded global ITC == unsharded ITC: the GSPMD replacement for the
    reference AllGather trick (reference models/xfm.py:81-101)."""
    mesh = make_mesh(eight_devices, data=8)
    r = np.random.RandomState(0)
    f1 = jnp.asarray(r.randn(16, 8), jnp.float32)
    f2 = jnp.asarray(r.randn(16, 8), jnp.float32)
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)

    unsharded = contrastive_loss(f1, f2, jnp.asarray(0.07))

    sh = batch_sharding(mesh)
    f1s, f2s = jax.device_put(f1, sh), jax.device_put(f2, sh)
    with mesh:
        sharded = jax.jit(contrastive_loss)(f1s, f2s, jnp.asarray(0.07))
    np.testing.assert_allclose(float(sharded), float(unsharded), rtol=1e-5)


def test_param_sharding_rules(eight_devices):
    mesh = make_mesh(eight_devices, data=2, fsdp=2, tensor=2)
    model = XFMForPretrain(tiny_cfg())
    batch = make_batch()
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           batch["images"], batch["text_ids"],
                           batch["text_atts"],
                           method=XFMForPretrain.init_all))["params"]
    specs = validated_specs(shapes, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    # qkv/query kernels must be tensor-sharded on the output dim
    found_tp = found_fsdp = 0
    for path, spec in flat:
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        if s.endswith("query/kernel"):
            assert spec[1] == "tensor", (s, spec)
            found_tp += 1
        if s.endswith("attn_out/kernel"):
            assert spec[0] == "tensor", (s, spec)
            found_fsdp += 1
    assert found_tp >= 4 and found_fsdp >= 4
    # everything 1D replicates or shards validly
    for path, spec in flat:
        assert isinstance(spec, P)


@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_sharded_train_step_runs(eight_devices, mesh_shape):
    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(eight_devices, data=data, fsdp=fsdp, tensor=tensor)
    model = XFMForPretrain(tiny_cfg())
    batch = make_batch()

    def init_params():
        return model.init({"params": jax.random.PRNGKey(0)},
                          batch["images"], batch["text_ids"],
                          batch["text_atts"],
                          method=XFMForPretrain.init_all)["params"]

    pshard = param_shardings(jax.eval_shape(init_params), mesh)
    with mesh:
        params = jax.jit(init_params, out_shardings=pshard)()

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, **batch, ret_mim=True,
                          rngs={"hardneg": rng})
        return (out["loss_itc"] + out["loss_itm"] + out["loss_mlm"]
                + out["loss_mim"]), out

    sbatch = shard_batch(mesh, batch)
    rng = jax.random.PRNGKey(1)
    with mesh:
        (loss, aux), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params, sbatch, rng)
    assert np.isfinite(float(loss))
    gnorm = float(jax.jit(lambda g: sum(jnp.sum(x * x) for x in
                                        jax.tree.leaves(g)))(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_sharded_loss_matches_replicated(eight_devices):
    """DP-sharded loss == single-device loss (deterministic parts)."""
    mesh = make_mesh(eight_devices, data=8)
    model = XFMForPretrain(tiny_cfg())
    batch = make_batch()

    def init_params():
        return model.init({"params": jax.random.PRNGKey(0)},
                          batch["images"], batch["text_ids"],
                          batch["text_atts"],
                          method=XFMForPretrain.init_all)["params"]

    params = init_params()

    def losses_det(params, batch):
        out = model.apply({"params": params}, **batch, ret_mim=True,
                          ret_match=False,
                          rngs={})
        return out["loss_itc"] + out["loss_mlm"] + out["loss_mim"]

    base = float(jax.jit(losses_det)(params, batch))
    sbatch = shard_batch(mesh, batch)
    pshard = param_shardings(jax.eval_shape(init_params), mesh)
    sparams = jax.tree.map(jax.device_put, params, pshard)
    with mesh:
        sharded = float(jax.jit(losses_det)(sparams, sbatch))
    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 1, 8)])
def test_tp_loss_matches_replicated(eight_devices, mesh_shape):
    """Deterministic losses must be numerically identical (up to fp noise)
    under tensor/fsdp sharding — validates the partition rules don't change
    the math."""
    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(eight_devices, data=data, fsdp=fsdp, tensor=tensor)
    model = XFMForPretrain(tiny_cfg())
    batch = make_batch()

    def init_params():
        return model.init({"params": jax.random.PRNGKey(0)},
                          batch["images"], batch["text_ids"],
                          batch["text_atts"],
                          method=XFMForPretrain.init_all)["params"]

    params = init_params()

    def losses_det(params, batch):
        out = model.apply({"params": params}, **batch, ret_mim=True,
                          ret_match=False, rngs={})
        return out["loss_itc"] + out["loss_mlm"] + out["loss_mim"]

    base = float(jax.jit(losses_det)(params, batch))
    pshard = param_shardings(jax.eval_shape(init_params), mesh)
    sparams = jax.tree.map(jax.device_put, params, pshard)
    sbatch = shard_batch(mesh, batch)
    with mesh:
        sharded = float(jax.jit(losses_det)(sparams, sbatch))
    np.testing.assert_allclose(sharded, base, rtol=3e-4, atol=3e-4)
