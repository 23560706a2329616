"""Train state + jitted train-step factory.

The reference's per-task python loops (forward, backward, clip, step spread
across Pretrain.py/Retrieval.py/accelerators/*) collapse into ONE jitted SPMD
step: loss → grad → optax update, with GSPMD supplying the gradient
reduction the apex DDP all-reduce used to do
(reference accelerators/apex_ddp_accelerator.py:88-110).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..core.partitioning import param_shardings


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def create_sharded_state(init_params_fn: Callable[[], Any],
                         make_tx: Callable[[Any], optax.GradientTransformation],
                         mesh: Mesh) -> TrainState:
    """Initialize params *directly into* their target shardings (weights never
    materialize replicated on one device), then build the optimizer state
    under jit so mu/nu inherit the param shardings via GSPMD propagation."""
    params_shape = jax.eval_shape(init_params_fn)
    pshard = param_shardings(params_shape, mesh)
    with mesh:
        params = jax.jit(init_params_fn, out_shardings=pshard)()
    tx = make_tx(params)
    with mesh:
        opt_state = jax.jit(tx.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, tx=tx)


def make_train_step(loss_fn: Callable, donate: bool = True):
    """loss_fn(params, batch, rng) -> (scalar_loss, aux_dict).

    Returns jitted step(state, batch, rng) -> (state, metrics). Shardings
    propagate from the committed input shardings (params via
    create_sharded_state, batch via core.mesh.shard_batch)."""

    def step(state: TrainState, batch, rng):
        def lf(params):
            return loss_fn(params, batch, rng)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(loss=loss, grad_norm=optax.global_norm(grads), **aux)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(loss_fn: Callable, n_steps: int):
    """`n_steps` optimizer steps per dispatch: batches arrive stacked on a
    leading K axis (shard_batch(..., batch_axis=1)) and are stepped inside ONE
    donated jitted `lax.scan`. Amortizes per-dispatch host/tunnel overhead
    (~30-50 ms/step through the axon tunnel, PERF.md "Dispatch finding") —
    this is how the task path reaches the same samples/s as bench.py.
    Donation is required: an un-donated scan double-buffers the multi-GB
    state carry. Returned metrics are means over the K steps."""

    def step(state: TrainState, batches, rng):
        def body(carry, k):
            st, r = carry
            r, sub = jax.random.split(r)
            bk = jax.tree.map(lambda x: x[k], batches)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, bk, sub), has_aux=True)(st.params)
            st = st.apply_gradients(grads)
            metrics = dict(loss=loss, grad_norm=optax.global_norm(grads),
                           **aux)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng),
                                           jnp.arange(n_steps))
        return state, jax.tree.map(
            lambda m: m.mean(0) if jnp.ndim(m) >= 1 else m, metrics)

    return jax.jit(step, donate_argnums=(0,))


def make_accum_train_step(loss_fn: Callable, accumulate_steps: int,
                          donate: bool = True):
    """Gradient accumulation (reference Retrieval.py:45,55-65,
    run_glue.py:314-360 `gradient_accumulation_steps`): batches arrive
    stacked on a leading K axis; grads of the K micro-batches are MEANed
    inside one jitted `lax.scan`, then ONE optimizer step is taken — the
    effective batch is K x micro-batch without the activation memory.
    Metric semantics: loss/aux are means over micro-batches; grad_norm is
    the norm of the accumulated (averaged) gradient, matching what the
    clip-by-global-norm inside the optimizer sees."""

    def step(state: TrainState, batches, rng):
        def body(carry, k):
            acc, r = carry
            r, sub = jax.random.split(r)
            bk = jax.tree.map(lambda x: x[k], batches)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, bk, sub), has_aux=True)(state.params)
            acc = jax.tree.map(jnp.add, acc, grads)
            return (acc, r), dict(loss=loss, **aux)

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (acc, _), metrics = jax.lax.scan(body, (zeros, rng),
                                         jnp.arange(accumulate_steps))
        grads = jax.tree.map(lambda g: g / accumulate_steps, acc)
        new_state = state.apply_gradients(grads)
        metrics = jax.tree.map(
            lambda m: m.mean(0) if jnp.ndim(m) >= 1 else m, metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
