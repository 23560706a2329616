"""Shared task scaffolding: what the reference spreads across each task
script's main() (reference Retrieval.py:234-384 etc.) — config, mesh,
model/optimizer/schedule construction, the jitted step, checkpoint cadence.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import load_config, resolve_vision_config, dump_config
from ..core.mesh import make_mesh, mesh_from_config
from ..core.partitioning import param_shardings
from ..train.metrics import MetricLogger, is_main_process
from ..train.optim import create_optimizer_from_config
from ..train.schedules import schedule_from_config
from ..train.train_state import (TrainState, make_accum_train_step,
                                 make_train_step)


@dataclasses.dataclass
class TaskContext:
    config: dict
    mesh: Any
    out_dir: str
    seed: int = 42

    @classmethod
    def from_args(cls, args, overrides: Optional[dict] = None,
                  allow_pipe: bool = False) -> "TaskContext":
        """allow_pipe: tasks that actually consume the pipe mesh axis
        (core.pipeline tower staging — the classify task's text-only
        ablation and the imagenet task's BEiT vision tower) opt out of
        the pipe>1 guard below."""
        cfg = load_config(args.config, overrides)
        cfg = resolve_vision_config(
            cfg, config_root=os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "configs",
                "model"))
        if getattr(args, "bs", None):
            _scale_batch(cfg, args.bs)
        if getattr(args, "epoch", None):
            sch = cfg.setdefault("schedular", {})
            sch["epochs"] = args.epoch
        if (not allow_pipe
                and int((cfg.get("parallel", {}) or {}).get("pipe", 1)) > 1):
            # The pipe mesh axis is consumed by core.pipeline tower staging
            # (GPipe over shard_map); the task entrypoints shard over
            # data/fsdp/tensor only, so under GSPMD a pipe>1 group would
            # replicate the whole step — correct but pipe-times wasteful.
            # Refuse rather than silently burn devices (docs/SCALING.md).
            raise ValueError(
                "parallel.pipe > 1 is not consumed by the task entrypoints "
                "(X-FM towers are 12-24 layers; dp/fsdp/tensor cover them). "
                "Pipeline the layer stack explicitly via core.pipeline."
            )
        mesh = mesh_from_config(cfg)
        out = getattr(args, "output_dir", "output")
        os.makedirs(out, exist_ok=True)
        if is_main_process():
            dump_config(cfg, os.path.join(out, "config.yaml"))
        return cls(config=cfg, mesh=mesh, out_dir=out,
                   seed=getattr(args, "seed", 42))


def _scale_batch(cfg: dict, global_bs: int) -> None:
    """--bs semantics: global batch / world_size (reference run.py:351,
    Retrieval.py:244-245)."""
    n = jax.device_count()
    for key in ("images", "texts", "regions", "images_imagenet"):
        if isinstance(cfg.get(key), dict) and "batch_size" in cfg[key]:
            cfg[key]["batch_size"] = max(1, global_bs // n)
    if "batch_size_train" in cfg:
        cfg["batch_size_train"] = max(1, global_bs // n)


def build_state(ctx: TaskContext, model, example_batch, init_method,
                steps_per_epoch: int, init_rngs: Optional[dict] = None):
    """Sharded init + optimizer from the YAML config blocks.

    `steps_per_epoch` is in micro-batches; with gradient accumulation K>1
    the optimizer (and so the optax schedule counter) steps once per K
    micro-batches, so the schedule horizon is the optimizer-step count
    (reference run_glue.py:314 num_update_steps_per_epoch =
    ceil(len(loader) / gradient_accumulation_steps))."""
    sched = schedule_from_config(
        ctx.config, opt_steps_per_epoch(ctx.config, steps_per_epoch))
    rngs = init_rngs or {"params": jax.random.PRNGKey(ctx.seed)}

    def init_params():
        return model.init(rngs, **example_batch, method=init_method)["params"]

    pshard = param_shardings(jax.eval_shape(init_params), ctx.mesh)
    with ctx.mesh:
        params = jax.jit(init_params, out_shardings=pshard)()
    tx = create_optimizer_from_config(params, ctx.config, sched)
    with ctx.mesh:
        opt_state = jax.jit(tx.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, tx=tx), sched


def maybe_bf16_params(ctx: TaskContext, state: TrainState, sched
                      ) -> TrainState:
    """`bf16_params: true` (YAML): live params stored bf16 (halves weight HBM
    traffic per forward) with an fp32 master copy inside the optimizer — the
    TPU-native replacement for apex O1 master params
    (reference accelerators/apex_ddp_accelerator.py:81-107). Call AFTER any
    torch-checkpoint import (the fp32 originals seed the master copy) and
    BEFORE Orbax resume (the restored tree must match this structure)."""
    if not ctx.config.get("bf16_params", False):
        return state
    from ..train.optim import with_master_weights

    params32 = state.params
    tx = with_master_weights(
        create_optimizer_from_config(params32, ctx.config, sched))
    with ctx.mesh:
        opt_state = jax.jit(tx.init)(params32)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x,
        params32)
    return TrainState(step=state.step, params=params, opt_state=opt_state,
                      tx=tx)


def save_epoch_checkpoint(ctx: TaskContext, state: TrainState, epoch: int,
                          name: str = "ckpt", keep: int = 2) -> None:
    """Per-epoch checkpoint under <out>/<name> (manager step = epoch)."""
    from ..train.checkpoint import save_checkpoint

    save_checkpoint(os.path.join(ctx.out_dir, name), state, step=epoch,
                    keep=keep)


def maybe_resume_epochs(ctx: TaskContext, state: TrainState):
    """Preemption-safe fine-tune resume (`resume: true` in the YAML):
    restore params/opt/step from the latest epoch checkpoint in <out>/ckpt
    and return (state, next_epoch). Round-1 gap: only pretrain could resume
    — a preempted 8-epoch VQA run restarted from scratch."""
    if not ctx.config.get("resume", False):
        return state, 0
    ckpt_dir = os.path.abspath(os.path.join(ctx.out_dir, "ckpt"))
    if not os.path.isdir(ckpt_dir):
        return state, 0
    import orbax.checkpoint as ocp

    from ..train.checkpoint import restore_checkpoint

    last = ocp.CheckpointManager(ckpt_dir).latest_step()
    if last is None:
        return state, 0
    state = restore_checkpoint(ckpt_dir, state, step=last)
    if is_main_process():
        print(f"### resumed fine-tune from epoch {last}, continuing at "
              f"{last + 1}", flush=True)
    return state, last + 1


def task_rng(ctx: TaskContext) -> jax.Array:
    """Task-loop PRNG key. On TPU defaults to the `rbg` generator — dropout
    is the only RNG consumer in the train step and threefry key derivation
    is VPU-expensive there (measured +8% step throughput on the 327M
    pretrain step, PERF.md); on CPU keeps the default threefry so test
    streams are unchanged. YAML `prng_impl:` overrides either way."""
    impl = ctx.config.get("prng_impl")
    if impl is None:
        impl = ("rbg" if jax.devices()[0].platform == "tpu"
                else "threefry2x32")
    return jax.random.key(ctx.seed, impl=impl)


def accum_steps_from_config(cfg: dict) -> int:
    """`accumulate_steps` (reference Retrieval.py:45) /
    `gradient_accumulation_steps` (reference run_glue.py:314-360)."""
    return max(1, int(cfg.get("accumulate_steps",
                              cfg.get("gradient_accumulation_steps", 1))))


def opt_steps_per_epoch(cfg: dict, micro_steps_per_epoch: int) -> int:
    """Optimizer steps per epoch: one per accumulation group of K
    micro-batches (reference run_glue.py:314 num_update_steps_per_epoch =
    ceil(len(loader) / gradient_accumulation_steps)). The optax schedule
    counter advances per optimizer step, so schedule horizons must use
    this, not the micro-batch count."""
    k = accum_steps_from_config(cfg)
    return max(1, -(-micro_steps_per_epoch // k))


def make_task_step(ctx: TaskContext, loss_fn):
    """→ (jitted step_fn, accum_steps). With accumulation K>1 the step
    consumes K stacked micro-batches and takes ONE optimizer step
    (train_state.make_accum_train_step); train_epoch does the stacking."""
    k = accum_steps_from_config(ctx.config)
    if k == 1:
        return make_train_step(loss_fn), 1
    return make_accum_train_step(loss_fn, k), k


def _group_batches(loader, k: int):
    """Group k consecutive micro-batches into one [k, B, ...]-stacked batch
    (trailing partial group dropped, matching drop_last train loaders)."""
    buf = []
    for b in loader:
        buf.append(b)
        if len(buf) == k:
            yield jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *buf)
            buf = []


def train_epoch(ctx: TaskContext, state: TrainState, step_fn, loader,
                rng: jax.Array, epoch: int, sched=None,
                print_freq: int = 50, max_steps: Optional[int] = None,
                accum_steps: int = 1):
    """One epoch over `loader` using the jitted `step_fn(state, batch, rng)`.
    Returns (state, stats dict) — the reference's per-task train() loops
    (e.g. Retrieval.py:35-75) collapse into this."""
    from ..data.prefetch import device_batches

    logger = MetricLogger()
    n = 0
    if accum_steps > 1:
        loader = _group_batches(loader, accum_steps)
    # Double buffering: H2D transfer + host collate run one batch ahead on a
    # daemon thread (data/prefetch.device_batches), off the dispatch path.
    loader = device_batches(loader, ctx.mesh,
                            batch_axis=1 if accum_steps > 1 else 0)
    try:
        for batch in logger.log_every(loader, print_freq,
                                      header=f"Train epoch {epoch}:",
                                      total=max_steps):
            rng, sub = jax.random.split(rng)
            with ctx.mesh:
                state, metrics = step_fn(state, batch, sub)
            # one device_get RPC for all scalars (vs one ~30ms tunnel
            # round-trip per float() on the dev harness)
            host = jax.device_get({k: v for k, v in metrics.items()
                                   if jnp.ndim(v) == 0})
            host = {k: float(v) for k, v in host.items()}
            if sched is not None:
                host["lr"] = float(sched(int(state.step)))
            logger.update(**host)
            n += 1
            if max_steps and n >= max_steps:
                break
    finally:
        loader.close()
    logger.synchronize_between_processes()
    return state, logger.global_avg()


def append_log(out_dir: str, payload: dict) -> None:
    """Epoch JSON lines → log.txt (reference Pretrain.py:252-258)."""
    if is_main_process():
        with open(os.path.join(out_dir, "log.txt"), "a") as f:
            f.write(json.dumps(payload) + "\n")
