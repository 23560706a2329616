"""Mixed-precision policy: TPU-native replacement for apex AMP O1
(reference accelerators/apex_ddp_accelerator.py:81-107).

On TPU, bf16 matmuls need no loss scaling (same exponent range as fp32), so
the whole apex master-param / dynamic-loss-scale machinery collapses to:
fp32 parameters + bf16 compute casts at module boundaries. A dynamic loss
scaler is still provided (`DynamicScaler`) for fp16-style completeness,
mirroring torch.cuda.amp.GradScaler
(reference accelerators/torch_ddp_accelerator.py:24-58), but it is unused by
default.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.output_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT = Policy()
FULL_F32 = Policy(compute_dtype=jnp.float32)


def enable_f32_parity() -> None:
    """Force true-f32 matmul accumulation (jax_default_matmul_precision =
    'highest'). Needed for numerically-matched logits vs the fp32 torch
    reference: both TPU MXU and this XLA CPU build otherwise run f32 matmuls
    at reduced (bf16-class) precision. bf16-input matmuls are unaffected, so
    the bf16 training path keeps full MXU speed."""
    jax.config.update("jax_default_matmul_precision", "highest")


def policy_from_config(config: dict) -> Policy:
    """Resolve the compute policy for the task path. Precedence:
    explicit `compute_dtype` YAML key > XFM_COMPUTE_DTYPE env (the test
    harness forces float32 on CPU) > `accelerator:` block compatibility
    (FP16_OPT_LEVEL O0 → fp32; reference configs set O1 → mixed precision,
    reference accelerators/apex_ddp_accelerator.py:81-87) > bf16 default."""
    import os

    cd = config.get("compute_dtype") or os.environ.get("XFM_COMPUTE_DTYPE")
    if cd:
        return FULL_F32 if str(cd) in ("float32", "fp32", "f32") else DEFAULT
    acc = config.get("accelerator", {}) or {}
    if str(acc.get("FP16_OPT_LEVEL", "O1")).upper() == "O0":
        return FULL_F32
    return DEFAULT


@dataclasses.dataclass
class DynamicScalerState:
    scale: jax.Array
    good_steps: jax.Array


class DynamicScaler:
    """optax-compatible dynamic loss scaler (parity with GradScaler semantics:
    growth on `growth_interval` clean steps, halving on non-finite grads)."""

    def __init__(self, init_scale=2.0**15, growth_interval=2000, factor=2.0):
        self.init_scale = init_scale
        self.growth_interval = growth_interval
        self.factor = factor

    def init(self) -> DynamicScalerState:
        return DynamicScalerState(
            scale=jnp.asarray(self.init_scale, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
        )

    def scale_loss(self, loss, state: DynamicScalerState):
        return loss * state.scale

    def unscale_and_update(self, grads, state: DynamicScalerState):
        inv = 1.0 / state.scale
        grads = jax.tree.map(lambda g: g * inv, grads)
        finite = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        grow = state.good_steps + 1 >= self.growth_interval
        new_scale = jnp.where(
            finite,
            jnp.where(grow, state.scale * self.factor, state.scale),
            state.scale / self.factor,
        )
        new_steps = jnp.where(finite & ~grow, state.good_steps + 1, 0)
        new_state = DynamicScalerState(scale=new_scale, good_steps=new_steps)
        return grads, finite, new_state
