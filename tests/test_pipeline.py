"""Pipeline-parallelism tests (GPipe schedule over a `pipe` mesh axis).

The reference has no pipeline parallelism (SURVEY §2.2: DP only) — these pin
the TPU rebuild's beyond-parity pp capability: stage-staggered execution via
shard_map + ppermute must match the plain sequential layer stack exactly, in
both the forward values and the parameter gradients (AD through the
permutes is the backward pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xfm_tpu.core.mesh import make_mesh
from xfm_tpu.core.pipeline import (merge_microbatches, pipeline_apply,
                                   pipelined_tower_forward, split_microbatches,
                                   stack_layer_params, text_stage_fn,
                                   to_stages, unstack_layer_params)
from xfm_tpu.models.text_encoder import TextConfig, TextTransformer


def _cfg(layers=8):
    return TextConfig.roberta_base(
        vocab_size=128, hidden_size=32, num_hidden_layers=layers,
        num_attention_heads=4, intermediate_size=64, fusion_layer=layers,
        encoder_width=32, max_position_embeddings=40, dtype=jnp.float32)


def _tower(cfg, seed=0):
    model = TextTransformer(cfg)
    r = np.random.RandomState(seed)
    ids = jnp.asarray(r.randint(3, cfg.vocab_size - 1, (8, 12)), jnp.int32)
    mask = jnp.ones((8, 12), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        attention_mask=mask, mode="text")["params"]
    return model, params, ids, mask


def test_stack_roundtrip():
    cfg = _cfg(4)
    _, params, _, _ = _tower(cfg)
    stacked = stack_layer_params(params, 4)
    back = unstack_layer_params(stacked, 4)
    for i in range(4):
        jax.tree.map(np.testing.assert_array_equal, back[f"layer_{i}"],
                     params[f"layer_{i}"])


@pytest.mark.parametrize("data_axes", [(), ("data",)])
def test_pipeline_matches_sequential(data_axes):
    cfg = _cfg(8)
    model, params, ids, mask = _tower(cfg)
    mesh = make_mesh(jax.devices()[:8], data=2, fsdp=1, tensor=1, pipe=4)

    ref = model.apply({"params": params}, ids, attention_mask=mask,
                      mode="text")

    @jax.jit
    def run(params):
        return pipelined_tower_forward(params, cfg, ids, mask, mesh,
                                       num_microbatches=4,
                                       data_axes=data_axes)

    with mesh:
        out = run(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential():
    cfg = _cfg(4)
    model, params, ids, mask = _tower(cfg)
    mesh = make_mesh(jax.devices()[:4], data=1, fsdp=1, tensor=1, pipe=4)

    def loss_seq(p):
        out = model.apply({"params": p}, ids, attention_mask=mask,
                          mode="text")
        return jnp.sum(out ** 2)

    def loss_pipe(p):
        out = pipelined_tower_forward(p, cfg, ids, mask, mesh,
                                      num_microbatches=4)
        return jnp.sum(out ** 2)

    g_seq = jax.grad(loss_seq)(params)
    with mesh:
        g_pipe = jax.jit(jax.grad(loss_pipe))(params)

    g_pipe_flat = dict(jax.tree_util.tree_flatten_with_path(g_pipe)[0])
    for path, v in jax.tree_util.tree_flatten_with_path(g_seq)[0]:
        np.testing.assert_allclose(np.asarray(g_pipe_flat[path]),
                                   np.asarray(v), rtol=3e-5, atol=3e-5,
                                   err_msg="/".join(str(p) for p in path))


def test_pipeline_microbatch_not_divisible_raises():
    with pytest.raises(ValueError):
        split_microbatches(jnp.zeros((7, 3)), 2)


def test_pipeline_raw_apply_identity_stage():
    """pipeline_apply with an identity-plus-params stage matches the obvious
    sequential composition (sanity for the schedule/masking itself)."""
    mesh = make_mesh(jax.devices()[:4], data=1, fsdp=1, tensor=1, pipe=4)
    S, M, mb, d = 4, 8, 2, 8
    r = np.random.RandomState(0)
    w = jnp.asarray(r.randn(S, d), jnp.float32)          # one vector per stage
    xs = jnp.asarray(r.randn(M, mb, d), jnp.float32)

    def stage_fn(w1, x, cm):
        return jnp.tanh(x + w1)

    with mesh:
        ys = jax.jit(lambda w, xs: pipeline_apply(
            w, xs, None, stage_fn, mesh))(w, xs)

    ref = xs
    for s in range(S):
        ref = jnp.tanh(ref + w[s])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), rtol=2e-6,
                               atol=2e-6)


def test_task_path_rejects_pipe_axis(tmp_path):
    """Task entrypoints shard over data/fsdp/tensor only; `parallel.pipe > 1`
    would silently replicate the whole step across pipe groups under GSPMD,
    so TaskContext refuses it with a pointer to core.pipeline."""
    import argparse

    import yaml

    from xfm_tpu.tasks.common import TaskContext

    cfg = {"parallel": {"data": -1, "pipe": 2}}
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    args = argparse.Namespace(config=str(p), output_dir=str(tmp_path / "o"),
                              bs=None, epoch=None, seed=0)
    with pytest.raises(ValueError, match="pipe"):
        TaskContext.from_args(args)
