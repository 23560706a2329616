"""GPipe-style pipeline parallelism over a mesh axis.

The reference framework is data-parallel only (SURVEY §2.2: multi-node DDP,
no TP/PP/SP anywhere); the TPU rebuild treats sharding as first-class and
this module supplies the *pipeline* axis: layer parameters are stacked into
`num_stages` groups that live one-stage-per-device along a ``pipe`` mesh
axis, and microbatches stream through the stages with `lax.ppermute` inside
`shard_map`. JAX AD through the permutes yields the reverse pipeline (the
backward bubble) for free — no hand-written backward schedule.

Schedule: plain GPipe. With S stages and M microbatches the pipeline runs
T = M + S - 1 ticks; every stage computes every tick (warmup/drain ticks
compute on zero activations and their outputs are masked), so the bubble
fraction is (S-1)/T of *compute* as well as time — the standard GPipe cost,
shrinking as M grows. Use M ≥ 4·S for <20% overhead.

Composition with the other axes: the microbatch dimension of the activations
can stay sharded over the (data, fsdp) batch axes — pass ``data_axes`` — and
tensor parallelism composes by leaving the ``tensor`` axis out of the
shard_map (params enter replicated over it; stage_fn's matmuls then shard
via ordinary GSPMD *inside* each stage... for the common case we instead run
pp in the shard_map over ('pipe',) only and let stage params carry no
tensor sharding). Gradient reduction over the data axes is inserted by
shard_map's transpose (replicated-input cotangents are psum'd).

This is capability beyond the reference (which has nothing to cite here);
the XFM-base towers are small enough that pp is never *required*, but the
framework exposes it for deeper stacks (beit_large 24L / multi-slice).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_layer_params(params: dict, num_layers: int,
                       fmt: str = "layer_{}") -> Any:
    """Stack per-layer param subtrees ``params[fmt.format(i)]`` into one tree
    whose leaves gain a leading ``num_layers`` dim.

    The per-layer trees must be homogeneous (same structure/shapes) — true
    for any contiguous run of TransformerLayer/BeitBlock params with the
    same ``has_cross_attention``.
    """
    trees = [params[fmt.format(i)] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_layer_params(stacked: Any, num_layers: int,
                         fmt: str = "layer_{}") -> dict:
    """Inverse of :func:`stack_layer_params` (for checkpoint export)."""
    return {fmt.format(i): jax.tree.map(lambda a: a[i], stacked)
            for i in range(num_layers)}


def to_stages(stacked: Any, num_stages: int) -> Any:
    """[L, ...] layer-stacked tree → [S, L/S, ...] stage-stacked tree."""

    def reshape(a):
        l = a.shape[0]
        if l % num_stages:
            raise ValueError(f"{l} layers not divisible by {num_stages} stages")
        return a.reshape(num_stages, l // num_stages, *a.shape[1:])

    return jax.tree.map(reshape, stacked)


def split_microbatches(x: Any, num_microbatches: int) -> Any:
    """[B, ...] pytree → [M, B/M, ...]; B must divide evenly."""

    def reshape(a):
        b = a.shape[0]
        if b % num_microbatches:
            raise ValueError(
                f"batch {b} not divisible by {num_microbatches} microbatches")
        return a.reshape(num_microbatches, b // num_microbatches, *a.shape[1:])

    return jax.tree.map(reshape, x)


def merge_microbatches(y: Any) -> Any:
    """[M, mb, ...] pytree → [M*mb, ...]."""
    return jax.tree.map(lambda a: a.reshape(a.shape[0] * a.shape[1],
                                            *a.shape[2:]), y)


def pipeline_apply(stage_params: Any, xs: jnp.ndarray, consts: Any,
                   stage_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
                   mesh: Mesh, axis: str = PIPE_AXIS,
                   data_axes: Sequence[str] = ()) -> jnp.ndarray:
    """Run ``stage_fn`` as an S-stage pipeline over microbatched inputs.

    Args:
      stage_params: pytree with leading dim S = mesh.shape[axis]; stage s's
        slice is that stage's parameters (typically [S, L/S, ...] from
        :func:`to_stages`, with stage_fn scanning its local sub-layers).
      xs: [M, mb, ...] microbatched hidden states (the tensor that flows
        stage-to-stage).
      consts: pytree of [M, ...] per-microbatch side inputs every stage
        needs for the microbatch it is currently processing (attention
        bias, cross-attention states, ...). May be None.
      stage_fn: (one_stage_params, x_mb, consts_mb) -> y_mb, y same
        shape/dtype as x.
      mesh: the device mesh; ``axis`` must be one of its axes.
      data_axes: mesh axes the microbatch dim (dim 1 of xs / dim ≥1 of
        consts) is sharded over; these axes join the shard_map so batch
        sharding is preserved through the pipeline.

    Returns:
      ys: [M, mb, ...] outputs, replicated over ``axis`` (psum of the
      last stage's masked outputs — only the last stage contributes).
    """
    S = mesh.shape[axis]
    M = xs.shape[0]
    if M < S:
        raise ValueError(f"need at least {S} microbatches for {S} stages")
    T = M + S - 1
    consts = {} if consts is None else consts

    def batched_spec(a, lead_none=1):
        # dim layout: [M, mb, ...] → P(None, data_axes, None...)
        parts = [None] * lead_none + ([tuple(data_axes)] if data_axes else [])
        return P(*parts)

    w_spec = jax.tree.map(lambda _: P(axis), stage_params)
    x_spec = batched_spec(xs)
    c_specs = jax.tree.map(lambda a: batched_spec(a), consts)

    def per_device(w, x_all, c_all):
        stage = lax.axis_index(axis)
        # local stage dim is 1 under shard_map: squeeze it.
        w1 = jax.tree.map(lambda a: jnp.squeeze(a, 0), w)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            # stage 0 injects microbatch t; others take the permuted carry.
            inject = lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x = jnp.where(stage == 0, inject, carry)
            # stage s processes microbatch t - s at tick t.
            mb = jnp.clip(t - stage, 0, M - 1)
            cm = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, mb, 0, keepdims=False),
                c_all)
            y = stage_fn(w1, x, cm)
            nxt = lax.ppermute(y, axis, perm)
            keep = (stage == S - 1) & (t >= S - 1)
            out = jnp.where(keep, y, jnp.zeros_like(y))
            return nxt, out

        carry0 = jnp.zeros_like(x_all[0])
        _, outs = lax.scan(tick, carry0, jnp.arange(T))
        ys = outs[S - 1:]                   # [M, mb, ...]; valid on last stage
        return lax.psum(ys, axis)           # replicate over the pipe axis

    kwargs = dict(mesh=mesh, in_specs=(w_spec, x_spec, c_specs),
                  out_specs=batched_spec(xs))
    try:
        fn = shard_map(per_device, check_vma=False, **kwargs)  # jax >= 0.8
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(per_device, check_rep=False, **kwargs)
    return fn(stage_params, xs, consts)


# ---------------------------------------------------------------------------
# Tower integration: pipeline a TextTransformer / BeitVisionTransformer layer
# stack. The embedding / head stay outside the pipeline (they are cheap and
# batch-parallel); only the homogeneous block stack is staged.
# ---------------------------------------------------------------------------


def text_stage_fn(config, has_cross_attention: bool = False,
                  axis: str = PIPE_AXIS):
    """stage_fn running a [L/S]-stacked run of TransformerLayers.

    consts: {'bias': [mb,1,1,T] or None, 'enc': [mb,Ne,C] or absent,
    'ebias': ...} per-microbatch side inputs. An optional 'seed' const
    (int32 scalar per (microbatch, data-shard)) enables dropout: each
    stage/layer folds its indices into the seed so every dropout site in
    the pipeline draws an independent mask, fresh per train step."""
    from ..models.text_encoder import TransformerLayer

    layer = TransformerLayer(config, has_cross_attention=has_cross_attention)

    def fn(w_stage, x, cm):
        bias = cm.get("bias")
        enc = cm.get("enc")
        ebias = cm.get("ebias")
        seed = cm.get("seed")

        if seed is None:
            def sublayer(h, wl):
                return layer.apply({"params": wl}, h, bias, enc, ebias,
                                   True, False), None

            x, _ = lax.scan(sublayer, x, w_stage)
            return x

        base = jax.random.fold_in(jax.random.PRNGKey(seed.reshape(())),
                                  lax.axis_index(axis))
        nl = jax.tree.leaves(w_stage)[0].shape[0]

        def sublayer(h, wl_i):
            wl, i = wl_i
            rngs = {"dropout": jax.random.fold_in(base, i)}
            return layer.apply({"params": wl}, h, bias, enc, ebias,
                               False, False, rngs=rngs), None

        x, _ = lax.scan(sublayer, x, (w_stage, jnp.arange(nl)))
        return x

    return fn


def beit_stage_fn(config):
    """stage_fn for a stacked run of BeitBlocks (self-attention only).

    consts: {'rpb': [mb?, H, N, N] or broadcastable rel-pos bias — BEiT's
    per-block tables are part of the stage params, so `rpb` here is only the
    shared table variant; usually absent."""
    from ..models.beit2 import BeitBlock

    block = BeitBlock(config)

    def fn(w_stage, x, cm):
        rpb = cm.get("rpb")

        def sublayer(h, wl):
            return block.apply({"params": wl}, h, rpb), None

        x, _ = lax.scan(sublayer, x, w_stage)
        return x

    return fn


def pipelined_beit_forward(vision_params: Any, config, images,
                           mesh: Mesh, num_microbatches: int,
                           axis: str = PIPE_AXIS,
                           data_axes: Sequence[str] = ()):
    """BEiT-2 `forward_avgpool` ([avgpool ‖ patches] readout) with the
    block stack staged over the ``pipe`` mesh axis — the beit2-large
    (24-block) consumer (used by tasks/imagenet.py when parallel.pipe > 1).

    Equivalent to ``BeitVisionTransformer.apply(...)`` for deterministic
    forwards: the per-block rel-pos tables ride inside the stacked stage
    params, patch-embed/cls run replicated before the pipeline, and the
    fc_norm/avgpool readout runs replicated after
    (models/beit2.py readout). drop_path/dropout are inference-off in the
    staged blocks, matching eval and the linear-probe (frozen-backbone)
    training path."""
    from ..models.beit2 import BeitVisionTransformer

    c = config
    if c.use_shared_rel_pos_bias:
        raise NotImplementedError(
            "pipelined BEiT requires per-block rel-pos tables (the default);"
            " the shared-table variant would need the table broadcast as a "
            "pipeline const")
    S = mesh.shape[axis]
    if c.depth % S:
        raise ValueError(f"{c.depth} blocks not divisible into {S} stages")
    tower = BeitVisionTransformer(c)
    x = tower.apply({"params": vision_params}, images,
                    method=BeitVisionTransformer.embed)
    stacked = stack_layer_params(vision_params, c.depth, fmt="block_{}")
    stages = to_stages(stacked, S)
    xs = split_microbatches(x, num_microbatches)
    ys = pipeline_apply(stages, xs, None, beit_stage_fn(c), mesh,
                        axis=axis, data_axes=data_axes)
    y = merge_microbatches(ys)
    out, _ = tower.apply({"params": vision_params}, y,
                         method=BeitVisionTransformer.readout)
    return out


def pipelined_tower_forward(tower_params: Any, config, input_ids, attention_mask,
                            mesh: Mesh, num_microbatches: int,
                            axis: str = PIPE_AXIS,
                            data_axes: Sequence[str] = (),
                            dropout_rng=None):
    """Text-mode TextTransformer forward with the layer stack pipelined.

    Equivalent to `TextTransformer(config).apply(..., mode='text')` for a
    config with fusion_layer == num_hidden_layers (pure self-attention
    stack); embeddings run replicated, layers run staged.

    ``dropout_rng``: optional PRNG key enabling train-mode dropout — the
    embedding dropout runs replicated with a derived key, and each
    (microbatch, data-shard) carries an int32 seed const from which every
    stage/layer folds an independent per-site key (see text_stage_fn).
    None (the default) runs fully deterministic.
    """
    from ..models.text_encoder import Embeddings, mask_to_bias

    c = config
    S = mesh.shape[axis]
    emb = Embeddings(c)
    if dropout_rng is None:
        x = emb.apply({"params": tower_params["embeddings"]}, input_ids)
    else:
        dropout_rng, erng = jax.random.split(dropout_rng)
        x = emb.apply({"params": tower_params["embeddings"]}, input_ids,
                      deterministic=False, rngs={"dropout": erng})
    bias = mask_to_bias(attention_mask) if attention_mask is not None else None

    stacked = stack_layer_params(tower_params, c.fusion_layer)
    stages = to_stages(stacked, S)
    xs = split_microbatches(x, num_microbatches)
    consts = {}
    if bias is not None:
        consts["bias"] = split_microbatches(bias, num_microbatches)
    if dropout_rng is not None:
        M = num_microbatches
        D = 1
        for a in data_axes:
            D *= mesh.shape[a]
        info = jnp.iinfo(jnp.int32)
        consts["seed"] = jax.random.randint(
            dropout_rng, (M, D), info.min, info.max, jnp.int32)
    ys = pipeline_apply(stages, xs, consts, text_stage_fn(c, axis=axis),
                        mesh, axis=axis, data_axes=data_axes)
    return merge_microbatches(ys)
