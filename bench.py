"""Benchmark: XFM-base (327M) pretrain step throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is pretrain samples/sec/chip for the full 4-loss step (ITC + ITM +
MLM + MIM: 3 vision forwards incl. masked MIM pass + hard-negative double
fusion pass + backward), mirroring the reference hot loop
(reference Pretrain.py:141-247, SURVEY.md §3.2). vs_baseline is measured
model FLOPs utilization (MFU) against the chip's peak bf16 FLOP/s, normalized
to the BASELINE.json 45%-MFU target (vs_baseline = MFU / 0.45).
"""
import json
from functools import partial
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent compilation cache: first compile of the 10-step scan takes
# minutes through the tunnel; repeats hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np


def peak_flops_per_chip() -> float:
    """Peak bf16 FLOP/s of the attached chip (defaults to v5e: 197 TFLOP/s;
    v4: 275; v5p: 459). Overridable via XFM_PEAK_TFLOPS."""
    env = os.environ.get("XFM_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    table = {"v4": 275e12, "v5e": 197e12, "v5 lite": 197e12,
             "v5lite": 197e12, "v5p": 459e12, "v6e": 918e12}
    for k, v in table.items():
        if k in kind or k in gen:
            return v
    return 197e12


def transformer_flops(n_layers, hidden, inter, seq, batch, vocab=0,
                      cross_kv=0):
    """Forward FLOPs of one encoder stack (matmuls only)."""
    per_tok = 4 * hidden * hidden + 2 * hidden * inter  # qkvo + mlp
    attn = 2 * 2 * seq * seq * hidden  # QK^T + PV
    cross = 0
    if cross_kv:
        per_tok += 2 * hidden * hidden  # q + out proj for cross
        cross = (2 * 2 * hidden * hidden * cross_kv  # k/v proj of enc states
                 + 2 * 2 * seq * cross_kv * hidden)
    flops_per_layer = 2 * seq * per_tok + attn + cross
    total = n_layers * flops_per_layer * batch
    if vocab:
        total += 2 * batch * seq * hidden * vocab
    return total


def pretrain_step_flops(B, T, M, patches, hidden=768, inter=3072, layers=12,
                        vocab=50265):
    Nv = patches + 1
    vision_fwd = transformer_flops(layers, hidden, inter, Nv, B)
    text_fwd = transformer_flops(layers, hidden, inter, T, B)
    fusion_fwd = transformer_flops(layers, hidden, inter, T, B,
                                   cross_kv=Nv)
    mlm_head = 2 * B * M * hidden * vocab
    fwd = (2 * vision_fwd          # full + masked (MIM)
           + 2 * text_fwd          # clean + masked text
           + 4 * fusion_fwd        # itm pos + 2×neg + fuse-mlm
           + mlm_head)
    return 3 * fwd  # fwd + backward ≈ 3× forward matmul FLOPs


def main():
    from __graft_entry__ import _batch, _loss_fn, _xfm_config
    from xfm_tpu.train.optim import create_optimizer
    from xfm_tpu.train.schedules import linear_warmup_decay
    from xfm_tpu.train.train_state import TrainState

    B = int(os.environ.get("XFM_BENCH_BATCH", "48"))
    T, M = 30, 15
    cfg = _xfm_config(dtype=jnp.bfloat16)
    from xfm_tpu.models import XFMForPretrain

    model = XFMForPretrain(cfg)
    batch = _batch(B=B, T=T, M=M, image_res=cfg.vision.image_res,
                   num_patches=cfg.vision.num_patches,
                   vocab=cfg.text.vocab_size)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, batch["images"], batch["text_ids"],
                        batch["text_atts"],
                        method=XFMForPretrain.init_all)["params"]
    tx = create_optimizer(params, linear_warmup_decay(1e-4, 1000, 100))
    if os.environ.get("XFM_BF16_PARAMS", "0") == "1":
        # bf16 live params + fp32 master in the optimizer. Measured on v5e at
        # batch 32: slower than fp32 params (145.8 vs 153.6 samples/s — the
        # fp32-master optimizer traffic outweighs the bf16 forward savings at
        # this size); becomes profitable when forward work dominates.
        from xfm_tpu.train.optim import with_master_weights

        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        tx = with_master_weights(create_optimizer(
            params, linear_warmup_decay(1e-4, 1000, 100)))
    state = TrainState.create(params, tx)
    loss_fn = _loss_fn(model)

    def step(state, batch, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    iters = int(os.environ.get("XFM_BENCH_ITERS", "10"))

    # K steps inside ONE jit (lax.scan): a single dispatch measures true
    # device throughput — per-dispatch tunnel latency (~30-50 ms/step here)
    # would otherwise dominate and is not representative of a production
    # host. Profiler-verified: device busy time matches this number.
    @partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, batch, rng):
        def body(carry, i):
            st, rng = carry
            rng, sub = jax.random.split(rng)
            st, loss = step(st, batch, sub)
            return (st, rng), loss

        (state, _), losses = jax.lax.scan(body, (state, rng),
                                          jnp.arange(iters))
        return state, losses[-1]

    # warmup/compile; a host fetch (float) forces true completion — through
    # the axon tunnel block_until_ready alone does not.
    state, loss = run_steps(state, batch, rng)
    _ = float(loss)

    # measure host↔device round-trip to subtract
    t0 = time.perf_counter()
    for i in range(5):
        _ = float(loss)
    rtt = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    state, loss = run_steps(state, batch, jax.random.fold_in(rng, 1))
    _ = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / iters

    samples_per_sec = B / dt
    flops = pretrain_step_flops(B, T, M, cfg.vision.num_patches)
    mfu = flops / dt / peak_flops_per_chip()
    print(json.dumps({
        "metric": "pretrain_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(mfu / 0.45, 4),
    }))


if __name__ == "__main__":
    main()
