"""LR schedules (reference scheduler.py + Imagenet.py:241-257)."""
from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_decay(lr: float, num_training_steps: int,
                        num_warmup_steps: int | float):
    """Per-step linear warmup → linear decay (reference scheduler.py:6-30).
    Fractional warmup is a fraction of total steps."""
    if isinstance(num_warmup_steps, float):
        assert 0 <= num_warmup_steps < 1
        num_warmup_steps = int(num_training_steps * num_warmup_steps)
    warm = max(1, num_warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = step / warm
        decay = (num_training_steps - step) / max(
            1, num_training_steps - num_warmup_steps)
        return lr * jnp.clip(jnp.where(step < num_warmup_steps, warmup,
                                       decay), 0.0, 1.0)

    return schedule


def half_cosine(lr: float, min_lr: float, epochs: int, warmup_epochs: int,
                steps_per_epoch: int):
    """Per-iter half-cosine with epoch-granular warmup
    (reference Imagenet.py:241-257)."""
    total = epochs * steps_per_epoch
    warm = warmup_epochs * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = lr * step / max(1, warm)
        progress = (step - warm) / max(1, total - warm)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warm, warmup, cos)

    return schedule


def schedule_from_config(config: dict, steps_per_epoch: int | None = None):
    sch = dict(config.get("schedular", config.get("scheduler", {})) or {})
    lr = sch.get("lr", 1e-4)
    if "num_training_steps" not in sch:
        assert steps_per_epoch is not None, \
            "need steps_per_epoch to derive num_training_steps"
        sch["num_training_steps"] = sch.get("epochs", 1) * steps_per_epoch
    kind = sch.get("sched", "linear")
    if kind == "linear":
        return linear_warmup_decay(lr, sch["num_training_steps"],
                                   sch.get("num_warmup_steps", 0))
    if kind == "cosine":
        return half_cosine(lr, sch.get("min_lr", 0.0), sch.get("epochs", 1),
                           sch.get("warmup_epochs", 0), steps_per_epoch)
    raise NotImplementedError(kind)
