"""Optimizers: 4-group AdamW + LARS, as optax transforms.

Replicates reference optim.py:
- AdamW betas (0.9, 0.98), eps 1e-8 (reference optim.py:48);
- 4 param groups {decay, no-decay} × {base lr, lr×lr_mult}, where the boosted
  group is the model's fresh heads ("init_params", reference optim.py:10-46)
  and the no-decay set is biases + all normalization params
  (reference optim.py:18-26);
- LARS for linear probes, skipping rate scaling/decay for ≤1D params
  (reference optim.py:53-87).

In flax terms the no-decay set is: any param named `bias`, any LayerNorm
`scale`, LayerScale gammas, cls/mask tokens and other 1-D/0-D leaves — we use
ndim <= 1, which covers exactly the torch name-list for these models.
"""
from __future__ import annotations

import re
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

# Fresh-head path fragments boosted by lr_mult — mirrors `init_params`
# collection (reference models/xfm.py:476,502-518 and task heads).
DEFAULT_BOOST_PATTERNS = (
    r".*vision_proj.*", r".*text_proj.*", r"(^|.*/)temp$",
    r".*itm_head.*", r".*bbox_head.*", r".*cls_head.*", r".*mim_lm_head.*",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def decay_mask(params):
    """True where weight decay applies — the reference's name-list rule
    (reference optim.py:17-25), not a ndim heuristic.

    The torch rule is a *substring* check over {bias, LayerNorm.weight/bias,
    norm.weight/bias, norm1.*, norm2.*} on dotted parameter names. Mapped to
    our tree paths:
    - any leaf whose name contains 'bias' → no decay (Dense bias, q_bias/
      v_bias, LayerNorm bias — all contain 'bias' in torch too);
    - a LayerNorm 'scale' under a module whose name contains 'norm'
      (LayerNorm/norm1/norm2/fc_norm/layer_norm/output_LayerNorm…) → no
      decay. The itm/bbox/cls head MLP LayerNorms ('ln', 'ln0'…) stay
      DECAYED: their torch modules are nn.Sequential children with numeric
      names ('itm_head.1.weight') that match nothing in the no-decay list,
      so the reference decays them — mirrored here on purpose.
    - everything else decays — including the 0-d `temp`, LayerScale
      gamma_1/2, cls/mask tokens, pos embeds and rel-pos tables, exactly as
      the torch name-list does (none of those names match it).

    (Until round 5 this used ndim > 1, which wrongly exempted temp,
    gamma_1/2 and the head LayerNorm scales — caught by the trajectory
    golden fixture.)"""

    def one(path, _):
        parts = [s.lower() for s in _path_str(path).split("/")]
        if "bias" in parts[-1]:
            return False
        if parts[-1] == "scale" and any("norm" in s for s in parts[:-1]):
            return False
        return True

    return jax.tree_util.tree_map_with_path(one, params)


def boost_mask(params, patterns: Sequence[str] = DEFAULT_BOOST_PATTERNS):
    pats = [re.compile(p) for p in patterns]

    def one(path, _):
        s = _path_str(path)
        return any(p.match(s) for p in pats)

    return jax.tree_util.tree_map_with_path(one, params)


def clip_by_global_norm_fused(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm semantics, TPU-efficient norm.

    optax's global_norm emits one scalar reduction per leaf (~400 tiny VPU
    ops for this model — profiled at ~29 ms/step on v5e, 11% of the pretrain
    step). Concatenating the raveled leaves first lets XLA lower the whole
    norm to a couple of large fused reductions (~4 ms)."""

    def update(updates, state, params=None):
        del params
        leaves = jax.tree.leaves(updates)
        flat = jnp.concatenate(
            [jnp.ravel(u).astype(jnp.float32) for u in leaves])
        g_norm = jnp.sqrt(jnp.sum(jnp.square(flat)))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g_norm, 1e-16))
        updates = jax.tree.map(lambda u: (u * scale).astype(u.dtype), updates)
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update)


def scale_by_hf_adam(b1: float = 0.9, b2: float = 0.98,
                     eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam scaling with the `transformers.optimization.AdamW` update the
    reference trains with (reference optim.py:1,48): eps is added to
    sqrt(v) BEFORE the bias-correction scaling —
        update = m · sqrt(1-b2^t)/(1-b1^t) / (sqrt(v) + eps)
    — whereas optax/torch AdamW bias-correct v first and add eps after.
    The difference is ~eps-level, but using the exact formulation keeps the
    trajectory golden fixture (tests/test_trajectory_golden.py) tight
    enough to catch real semantics drift."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32),
                                      mu=z, nu=jax.tree.map(jnp.zeros_like,
                                                            params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        c = count.astype(jnp.float32)
        step_size = jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        upd = jax.tree.map(lambda m, v: m * step_size / (jnp.sqrt(v) + eps),
                           mu, nu)
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def create_optimizer(
    params,
    learning_rate: Callable[[int], float] | float,
    weight_decay: float = 0.01,
    lr_mult: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    clip_grad_norm: float | None = 1.0,
    boost_patterns: Sequence[str] = DEFAULT_BOOST_PATTERNS,
) -> optax.GradientTransformation:
    """AdamW with the reference's 4 param groups.

    update = lr_group * (adam(g) + wd_group * p), matching torch AdamW where
    lr_group = lr*(lr_mult if boosted) and wd_group = 0 for no-decay params.
    Gradient clipping (global norm 1.0,
    reference accelerators/apex_ddp_accelerator.py:100-110) runs first.
    """
    dmask = decay_mask(params)
    chain = []
    if clip_grad_norm:
        import os

        # Measured on v5e (B=48 pretrain step): the concat-based fused norm
        # is SLOWER end-to-end (172 vs 190 samples/s) — the 1.3 GB concat
        # serializes at the end of backward, while optax's per-leaf
        # reductions overlap with optimizer work. Kept opt-in for larger
        # models where leaf-count overhead dominates.
        if os.environ.get("XFM_FUSED_CLIP", "0") == "1":
            chain.append(clip_by_global_norm_fused(clip_grad_norm))
        else:
            chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(scale_by_hf_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=dmask))
    if lr_mult != 1.0:
        bmask = boost_mask(params, boost_patterns)
        chain.append(optax.masked(optax.scale(lr_mult), bmask))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def create_optimizer_from_config(params, config: dict,
                                 learning_rate) -> optax.GradientTransformation:
    opt = config.get("optimizer", {}) or {}
    acc = config.get("accelerator", {}) or {}
    # Clipping is an ACCELERATOR feature in the reference (apex/DDP
    # optimizer_step clips cfg.CLIP_GRAD_NORM — a REQUIRED key there,
    # accelerators/*.py:41) — the plain fine-tune scripts (Retrieval/VQA/
    # NLVR/Grounding_bbox/Captioning/glue) build bare torch AdamW and
    # never clip. Mirror that exactly: clip iff the config sets
    # accelerator.CLIP_GRAD_NORM (pretrain + *_O1 domain pretrains do).
    # The ~350 per-leaf norm reduces are also ~10% of the 480px step
    # (PERF.md r4).
    clip = acc.get("CLIP_GRAD_NORM")
    return create_optimizer(
        params,
        learning_rate,
        weight_decay=opt.get("weight_decay", 0.01),
        lr_mult=opt.get("lr_mult", 1.0),
        clip_grad_norm=clip,
    )


def with_master_weights(inner: optax.GradientTransformation,
                        master_dtype=jnp.float32
                        ) -> optax.GradientTransformation:
    """Mixed precision the TPU way: live params stay bf16 (halves weight HBM
    traffic per forward — measured +24% step throughput on v5e), while the
    optimizer keeps an fp32 master copy and does all update math in fp32
    (replaces apex O1 master params,
    reference accelerators/apex_ddp_accelerator.py:81-107).

    Returned updates are `new_master.astype(param_dtype) - params`, so
    `optax.apply_updates` leaves params equal to the rounded master up to one
    final bf16 rounding of the add (≤1 ulp, non-accumulating: the delta is
    recomputed against the live params every step).
    """

    def init(params):
        master = jax.tree.map(lambda p: p.astype(master_dtype), params)
        return {"master": master, "inner": inner.init(master)}

    def update(grads, state, params):
        g32 = jax.tree.map(lambda g: g.astype(master_dtype), grads)
        updates32, inner_state = inner.update(g32, state["inner"],
                                              state["master"])
        master = optax.apply_updates(state["master"], updates32)
        deltas = jax.tree.map(
            lambda m, p: m.astype(p.dtype) - p, master, params)
        return deltas, {"master": master, "inner": inner_state}

    return optax.GradientTransformation(init, update)


def lars(learning_rate, weight_decay: float = 0.0, momentum: float = 0.9,
         trust_coefficient: float = 0.001) -> optax.GradientTransformation:
    """LARS (reference optim.py:53-87): trust-ratio scaling + heavy-ball
    momentum; ≤1D params get plain SGD-with-momentum, no decay."""

    def init(params):
        return dict(mu=jax.tree.map(jnp.zeros_like, params),
                    count=jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        def one(g, p, mu):
            if p.ndim > 1:
                g = g + weight_decay * p
                pn = jnp.linalg.norm(p)
                gn = jnp.linalg.norm(g)
                q = jnp.where(pn > 0,
                              jnp.where(gn > 0, trust_coefficient * pn / gn,
                                        1.0),
                              1.0)
                g = g * q
            return mu * momentum + g

        mu = jax.tree.map(one, grads, params, state["mu"])
        count = state["count"] + 1
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        updates = jax.tree.map(lambda m: -lr * m, mu)
        return updates, dict(mu=mu, count=count)

    return optax.GradientTransformation(init, update)
