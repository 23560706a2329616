"""Flagship-scale sharded compile evidence (VERDICT r4 #3).

AOT-compiles the REAL 327M XFM-base pretrain train step — 12 layers x 3
towers, hidden 768, 224px, vocab 50265 (reference
configs/xfm-pt/Pretrain_XBrain_base_4m.yaml + config_beit2_base.json) —
on a dp2 x fsdp2 x tp2 mesh of 8 devices via .lower().compile(), then:

- asserts the parameters actually land SHARDED (no silent full
  replication): every >=0.5 MB leaf must carry a non-trivial
  PartitionSpec, and the replicated fraction of total param bytes must
  stay under 5%;
- reports compiled.memory_analysis() per-device estimates (argument /
  output / temp / code) for docs/SCALING.md.

Everything runs on ShapeDtypeStructs — no 327M arrays are materialized,
so this runs on the 8 virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8). Wired into
`dryrun_multichip` under XFM_DRYRUN_FLAGSHIP=1 and exercised by
tests/test_sharding.py::test_flagship_config_compiles_sharded.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def flagship_compile(n_devices: int = 8, batch: int = 32, verbose=True):
    import __graft_entry__ as g
    from xfm_tpu.core.mesh import batch_sharding, make_mesh, replicated
    from xfm_tpu.core.partitioning import param_shardings
    from xfm_tpu.models import XFMForPretrain
    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.schedules import linear_warmup_decay
    from xfm_tpu.train.train_state import TrainState

    mesh = make_mesh(jax.devices()[:n_devices], data=2, fsdp=2,
                     tensor=n_devices // 4)
    cfg = g._xfm_config()  # flagship defaults: 768/12L/3 towers/224px/bf16
    model = XFMForPretrain(cfg)
    bshapes = jax.eval_shape(
        lambda: g._batch(B=batch, T=30, M=15, image_res=cfg.vision.image_res,
                         num_patches=cfg.vision.num_patches,
                         vocab=cfg.text.vocab_size))
    bsh = batch_sharding(mesh)
    b_avals = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=bsh),
        bshapes)

    def init_params(images, ids, atts):
        return model.init({"params": jax.random.PRNGKey(1)}, images, ids,
                          atts, method=XFMForPretrain.init_all)["params"]

    pshape = jax.eval_shape(init_params, b_avals["images"],
                            b_avals["text_ids"], b_avals["text_atts"])
    pshard = param_shardings(pshape, mesh)

    # ---- sharding assertions (the partitioning spec itself) -------------
    leaves = jax.tree.leaves_with_path(pshape)
    shard_leaves = dict(
        (jax.tree_util.keystr(p), s) for p, s in
        jax.tree.leaves_with_path(pshard, is_leaf=lambda x: hasattr(x, "spec")))
    total = repl = 0
    offenders = []
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        size = int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        total += size
        spec = shard_leaves[key].spec
        is_repl = all(ax is None for ax in tuple(spec) + (None,))
        if is_repl:
            repl += size
            if size >= 512 * 1024:
                offenders.append((key, leaf.shape, size))
    assert not offenders, f"large replicated params: {offenders[:5]}"
    frac = repl / total
    assert frac < 0.05, f"replicated param fraction {frac:.1%}"

    p_avals = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        pshape, pshard)

    tx = create_optimizer(p_avals, linear_warmup_decay(1e-4, 1000, 100),
                          weight_decay=0.01, lr_mult=2.0)
    with mesh:
        opt_compiled = jax.jit(tx.init).lower(p_avals).compile()
    opt_shardings = opt_compiled.output_shardings
    opt_shape = jax.eval_shape(tx.init, p_avals)

    def fix_sh(sh):
        # scalars (adam count etc.) come back single-device; replicate them
        return sh if len(sh.device_set) == n_devices else replicated(mesh)

    o_avals = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=fix_sh(sh)),
        opt_shape, opt_shardings)

    state_aval = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated(mesh)),
        params=p_avals, opt_state=o_avals, tx=tx)
    rng_aval = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    loss_fn = g._loss_fn(model)

    def train_step(state, batch, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    with mesh:
        compiled = jax.jit(train_step, donate_argnums=(0,)).lower(
            state_aval, b_avals, rng_aval).compile()

    stats = {"param_bytes_total": total,
             "param_bytes_replicated": repl,
             "replicated_fraction": round(frac, 4)}
    try:
        mem = compiled.memory_analysis()
        for name in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            v = getattr(mem, name, None)
            if v is not None:
                stats[name] = int(v)
    except Exception as e:  # CPU backends may not implement it
        stats["memory_analysis_error"] = str(e)
    if verbose:
        mb = 1024 * 1024
        print(f"flagship-ok mesh="
              f"{dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"params={total / mb:.1f}MB replicated={frac:.2%}")
        for k, v in stats.items():
            if k.endswith("bytes"):
                print(f"  {k}: {v / mb:.1f} MB")
            else:
                print(f"  {k}: {v}")
    return stats


if __name__ == "__main__":
    flagship_compile()
