#!/usr/bin/env python
"""Per-op TPU time breakdown for a model forward (or train step).

Collects a ``jax.profiler`` trace on the real chip and prints the top-N XLA
ops by self time, with shapes — the tool VERDICT r2 asked for to turn
"XLA shape-tiling artifact" hypotheses into measured op-level facts.

Usage:
    python tools/profile_ops.py --model pvt_pranet_v2 --bs 16 [--train]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import glob
import gzip
import json
import os
import tempfile


def collect_trace(fn, args, trace_dir, iters=10):
    import jax
    import numpy as np

    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def parse_trace_events(trace_dir):
    """Read the trace-viewer JSON the profiler writes alongside xplane.pb."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:  # fall back: convert the xplane ourselves
        xp = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
        if not xp:
            raise FileNotFoundError(f"no trace output under {trace_dir}")
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xp, "trace_viewer", {})
        return json.loads(data)["traceEvents"]
    with gzip.open(files[0], "rt") as f:
        return json.load(f)["traceEvents"]


def op_table(events, top=40):
    """Aggregate device-lane complete events by op name."""
    # find TPU device lanes (pid/tid named like '/device:TPU:0' XLA Ops)
    lane_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lane_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in lane:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        a = agg.setdefault(name, [0.0, 0, ""])
        a[0] += dur
        a[1] += 1
        if not a[2]:
            args = e.get("args", {})
            a[2] = args.get("shape", args.get("long_name", ""))[:70]
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    return rows, total


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="pvt_pranet_v2")
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--train", action="store_true")
    p.add_argument("--trace_dir", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pranet2_tpu.models import get_model
    from pranet2_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    kwargs = {"num_class": 1} if args.model.endswith("_v2") else {}
    model = get_model(args.model, dtype=dt, **kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.bs, args.size, args.size, 3), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    if args.train:
        import optax

        from pranet2_tpu.losses import structure_loss

        gts = jnp.asarray((rng.random((args.bs, args.size, args.size, 1)) > .5)
                          .astype(np.float32))
        tx = optax.chain(optax.clip(0.5), optax.adam(1e-4))

        @jax.jit
        def fn(state, x, gts):
            params, stats, opt = state

            def lf(p):
                o, u = model.apply({"params": p, "batch_stats": stats}, x,
                                   True, mutable=["batch_stats"],
                                   rngs={"dropout": jax.random.key(0)})
                return (sum(structure_loss(f, b, gts, 1 - gts)
                            for f, b in zip(o[:4], o[4:])),
                        u["batch_stats"])

            (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(params)
            upd, opt2 = tx.update(g, opt, params)
            return (optax.apply_updates(params, upd), ns, opt2), loss

        state = (variables["params"], variables.get("batch_stats", {}),
                 tx.init(variables["params"]))
        call_args = (state, x, gts)
    else:
        v2 = args.model.endswith("_v2")

        @jax.jit
        def fn(v, x):
            outs = model.apply(v, x)
            return (outs[0] + outs[1] + outs[2] + outs[3]) if v2 else outs[3]

        call_args = (variables, x)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_ops_")
    collect_trace(fn, call_args, trace_dir, iters=args.iters)
    rows, total = op_table(parse_trace_events(trace_dir), top=args.top)
    print(f"total device op time: {total:.2f} ms over {args.iters} iters "
          f"({total/args.iters:.2f} ms/iter)")
    print(f"{'ms':>9} {'%':>5} {'n':>5}  op")
    for name, (ms, n, shape) in rows:
        print(f"{ms:9.2f} {100*ms/total:5.1f} {n:5d}  {name}  {shape}")
    print(f"trace: {trace_dir}")


if __name__ == "__main__":
    main()
