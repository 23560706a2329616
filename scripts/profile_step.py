"""Capture a jax.profiler trace of the pretrain step and print per-op device
time totals, without TensorBoard: parses the .xplane.pb protobuf with a
minimal wire-format reader (no tensorflow dependency in the image).

Usage: XFM_BENCH_BATCH=48 python scripts/profile_step.py [--top 40]
"""
from __future__ import annotations

import glob
import gzip
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# minimal protobuf wire parser
# ---------------------------------------------------------------------------


def read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_event(buf):
    md = dur = off = 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            md = v
        elif fno == 2:
            off = v
        elif fno == 3:
            dur = v
    return md, off, dur


def interval_union(iv):
    """Total covered picoseconds of a list of (start, end) intervals."""
    iv.sort()
    tot = 0
    cs = ce = None
    for s, e in iv:
        if ce is None or s > ce:
            if ce is not None:
                tot += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    if ce is not None:
        tot += ce - cs
    return tot


def parse_line(buf):
    name = b""
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v
        elif fno == 4:
            events.append(parse_event(v))
    return name, events


def parse_event_metadata(buf):
    mid = 0
    name = b""
    for fno, wt, v in fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            name = v
    return mid, name


def parse_plane(buf):
    name = b""
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:  # map<int64, XEventMetadata>
            k = m = None
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    m = parse_event_metadata(v2)
            if m is not None:
                meta[m[0]] = m[1]
    return name, lines, meta


def parse_space(buf):
    return [parse_plane(v) for fno, wt, v in fields(buf) if fno == 1]


def categorize(name: str) -> str:
    """%loop_multiply_add_fusion.123 = f32[...] ... → category key."""
    import re

    head = name.split(" = ", 1)[0].strip().lstrip("%")
    head = re.sub(r"[.\d]+$", "", head)
    shape = ""
    # Everything between "= " and the opcode's "(" is the output shape spec;
    # keep the whole tuple ("(f32[], bf16[768,3072,1])" is a weight-grad
    # matmul with a fused norm partial, not a scalar op) but strip the
    # per-element layout annotations for readability.
    m = re.search(r"= (.+?) [a-z][a-z0-9-]*\(", name)
    if m:
        shape = " " + re.sub(r"\{[^{}]*\}", "", m.group(1))
    return head + shape


def op_totals(xspace_path, plane_filter=("TPU", "/device")):
    with open(xspace_path, "rb") as f:
        data = f.read()
    if xspace_path.endswith(".gz"):
        data = gzip.decompress(data)
    totals = defaultdict(int)
    counts = defaultdict(int)
    by_line = defaultdict(int)
    busy = defaultdict(list)   # line -> [(start, end)] of leaf events
    plane_names = []
    for pname, lines, meta in parse_space(data):
        pn = pname.decode(errors="replace")
        plane_names.append(pn)
        if not any(s in pn for s in plane_filter):
            continue
        for lname, events in lines:
            ln = lname.decode(errors="replace")
            for mid, off, dur in events:
                name = meta.get(mid, b"?").decode(errors="replace")
                by_line[ln] += dur
                if name.startswith("%while") or name.startswith("jit_") \
                        or name.isdigit():
                    continue  # enclosing spans, not leaves
                busy[ln].append((off, off + dur))
                cat = f"[{ln}] {categorize(name)}"
                totals[cat] += dur
                counts[cat] += 1
    return totals, counts, plane_names, by_line, busy


def main():
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    logdir = "/tmp/xfm_profile"
    existing = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not existing or "--fresh" in sys.argv:
        import jax
        import jax.numpy as jnp
        import numpy as np
        from functools import partial
        from __graft_entry__ import _batch, _loss_fn, _xfm_config
        from xfm_tpu.models import XFMForPretrain
        from xfm_tpu.train.optim import create_optimizer
        from xfm_tpu.train.schedules import linear_warmup_decay
        from xfm_tpu.train.train_state import TrainState

        B = int(os.environ.get("XFM_BENCH_BATCH", "48"))
        cfg = _xfm_config(dtype=jnp.bfloat16)
        model = XFMForPretrain(cfg)
        batch = _batch(B=B, T=30, M=15, image_res=cfg.vision.image_res,
                       num_patches=cfg.vision.num_patches,
                       vocab=cfg.text.vocab_size)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng}, batch["images"],
                            batch["text_ids"], batch["text_atts"],
                            method=XFMForPretrain.init_all)["params"]
        tx = create_optimizer(params, linear_warmup_decay(1e-4, 1000, 100))
        state = TrainState.create(params, tx)
        loss_fn = _loss_fn(model)

        @partial(jax.jit, donate_argnums=(0,))
        def run_steps(state, batch, rng):
            def body(carry, i):
                st, rng = carry
                rng, sub = jax.random.split(rng)
                (loss, _), grads = jax.value_and_grad(
                    lambda p: loss_fn(p, batch, rng),
                    has_aux=True)(st.params)
                return (st.apply_gradients(grads), rng), loss

            (state, _), losses = jax.lax.scan(body, (state, rng),
                                              jnp.arange(3))
            return state, losses[-1]

        state, loss = run_steps(state, batch, rng)  # compile
        _ = float(loss)
        jax.profiler.start_trace(logdir)
        state, loss = run_steps(state, batch, jax.random.fold_in(rng, 7))
        _ = float(loss)
        jax.profiler.stop_trace()
        existing = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)

    path = max(existing, key=os.path.getmtime)
    print(f"# parsing {path}")
    totals, counts, planes, by_line, busy = op_totals(path)
    print(f"# planes: {planes}")
    for ln, ps in sorted(by_line.items(), key=lambda kv: -kv[1]):
        print(f"# line {ln!r}: {ps / 1e9:.3f} ms summed")
    # Interval-union busy time is the honest utilization number: per-op sums
    # double-count nested/overlapping events (async DMA overlaps compute, and
    # events repeat per scan iteration), so "sum >> wall" does NOT mean the
    # device is oversubscribed. union(all lines) vs the trace span is the
    # idle fraction.
    allv = []
    for ln, iv in busy.items():
        u = interval_union(list(iv))
        allv += iv
        print(f"# line {ln!r}: {u / 1e9:.3f} ms union-busy")
    if allv:
        span = max(e for _, e in allv) - min(s for s, _ in allv)
        u = interval_union(allv)
        print(f"# device union-busy {u / 1e9:.3f} ms / span {span / 1e9:.3f}"
              f" ms = {100 * u / span:.1f}% busy")
    total_ps = sum(totals.values())
    print(f"# leaf-op time: {total_ps / 1e9:.3f} ms over 3 steps "
          f"(summed, overlap double-counted)")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ps / 1e9:10.3f} ms  {100 * ps / total_ps:5.1f}%  "
              f"×{counts[name]:<6d} {name[:120]}")


if __name__ == "__main__":
    main()
