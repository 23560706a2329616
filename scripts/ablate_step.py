"""Component ablation of the pretrain step: times loss subsets at the bench
batch size to locate the remaining cost pools (PERF.md methodology)."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _batch, _xfm_config
from xfm_tpu.models import XFMForPretrain
from xfm_tpu.train.optim import create_optimizer
from xfm_tpu.train.schedules import linear_warmup_decay
from xfm_tpu.train.train_state import TrainState


def main():
    B = int(os.environ.get("XFM_BENCH_BATCH", "48"))
    T, M = 30, 6
    cfg = _xfm_config()
    model = XFMForPretrain(cfg)
    batch = _batch(B=B, T=T, M=M, image_res=cfg.vision.image_res,
                   num_patches=cfg.vision.num_patches,
                   vocab=cfg.text.vocab_size)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch["images"],
                        batch["text_ids"], batch["text_atts"],
                        method=XFMForPretrain.init_all)["params"]
    sched = linear_warmup_decay(1e-4, 10000, 100)
    tx = create_optimizer(params, sched, weight_decay=0.01, lr_mult=1.0,
                          clip_grad_norm=1.0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=jax.jit(tx.init)(params), tx=tx)

    subsets = [
        ("itc", ("loss_itc",)),
        ("itc+mlm", ("loss_itc", "loss_mlm")),
        ("itc+mlm+itm", ("loss_itc", "loss_mlm", "loss_itm")),
        ("full(+mim)", ("loss_itc", "loss_mlm", "loss_itm", "loss_mim")),
    ]
    iters = 10
    prev = None
    for name, keys in subsets:
        def loss_fn(params, batch, rng, _keys=keys):
            out = model.apply({"params": params}, **batch,
                              ret_mim=("loss_mim" in _keys),
                              deterministic=True, rngs={"hardneg": rng})
            return sum(out[k] for k in _keys), out

        @partial(jax.jit, donate_argnums=(0,))
        def run(state, batch, rng):
            def body(carry, _):
                st, r = carry
                r, sub = jax.random.split(r)
                (l, _), g = jax.value_and_grad(
                    lambda p: loss_fn(p, batch, sub), has_aux=True)(
                        st.params)
                return (st.apply_gradients(g), r), l

            (st, _), ls = jax.lax.scan(body, (state, rng),
                                       jnp.arange(iters))
            return st, ls[-1]

        st, l = run(state, batch, rng)
        _ = float(l)
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(l)
        rtt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        st, l = run(st, batch, jax.random.fold_in(rng, 1))
        _ = float(l)
        dt = (time.perf_counter() - t0 - rtt) / iters * 1e3
        marg = "" if prev is None else f"  (+{dt - prev:.1f})"
        print(f"{name:14s}: {dt:7.1f} ms/step{marg}", flush=True)
        prev = dt
        state = st


if __name__ == "__main__":
    main()
