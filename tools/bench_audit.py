#!/usr/bin/env python
"""Audit the inference-throughput measurement on the real chip.

Round-1 recorded 25.6k img/s for PraNet-V2 bs16 @352^2 bf16 — at ~25.8
GFLOP/img that is 660 TFLOP/s on a chip whose bf16 peak is ~197, so the
*measurement* must be wrong, not the model fast.  This script pins down the
real number three ways:

1. window scaling: total time for N=10/25/50/100 dispatches must grow
   ~linearly with N if blocking semantics are sound;
2. hard completion: a tiny D2H fetch of the last output (np.asarray) cannot
   return before the device finished every queued step;
3. per-iteration data dependency: feed step i's scalar sum back into step
   i+1's input so steps cannot collapse/overlap illegitimately.

Prints achieved img/s under each protocol plus implied TFLOP/s and MFU.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import time

import jax
import jax.numpy as jnp
import numpy as np

def main(batch_size=16, size=352):
    from pranet2_tpu.models import get_model
    from pranet2_tpu.utils.profiling import cost_analysis, device_peak_tflops

    kind, peak = device_peak_tflops()
    print(f"device: {kind} (peak bf16 ~{peak} TFLOP/s)")

    model = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch_size, size, size, 3), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def fwd(v, x):
        outs = model.apply(v, x)
        return outs[0] + outs[1] + outs[2] + outs[3]

    cost = cost_analysis(fwd, variables, x)
    if cost["flops"]:
        gflop_img = cost["flops"] / batch_size / 1e9
        byte_s = (f"bytes {cost['bytes_accessed']/1e9:.2f} GB/batch"
                  if cost["bytes_accessed"] else "bytes unavailable")
        print(f"HLO flops: {gflop_img:.1f} GFLOP/img, {byte_s}")
    else:
        gflop_img = None
        print("HLO flops unavailable on this backend — "
              "TFLOP/s / MFU columns omitted")

    for _ in range(5):
        out = fwd(variables, x)
    jax.block_until_ready(out)

    def report(tag, n, dt):
        fps = batch_size * n / dt
        extra = ""
        if gflop_img:
            tf = fps * gflop_img / 1e3
            extra = f", {tf:6.1f} TFLOP/s"
            if peak:
                extra += f", MFU {100*tf/peak:.1f}%"
        print(f"  {tag:28s} N={n:4d}: {dt*1e3:8.1f} ms total, "
              f"{fps:8.1f} img/s{extra}")

    # 1. window scaling with block_until_ready
    print("protocol A: sequential dispatch, block_until_ready(last)")
    for n in (10, 25, 50, 100):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        report("block_until_ready", n, time.perf_counter() - t0)

    # 2. hard completion via D2H of the last output
    print("protocol B: sequential dispatch, np.asarray(last) fetch")
    for n in (10, 50):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(variables, x)
        _ = np.asarray(out[0, 0, 0])
        report("D2H fetch", n, time.perf_counter() - t0)

    # 3. serialized chain: out feeds the next input (no overlap possible)
    @jax.jit
    def fwd_chain(v, x, s):
        outs = model.apply(v, x + 0.0 * s)
        r = outs[0] + outs[1] + outs[2] + outs[3]
        return r, jnp.mean(r)

    s = jnp.float32(0)
    r, s = fwd_chain(variables, x, s)
    jax.block_until_ready(s)
    print("protocol C: serialized data-dependent chain")
    for n in (10, 50):
        t0 = time.perf_counter()
        for _ in range(n):
            r, s = fwd_chain(variables, x, s)
        jax.block_until_ready(s)
        report("chained", n, time.perf_counter() - t0)

    # 3b. device-resident loop: lax.scan of K steps inside ONE dispatch,
    # with a data-dependent carry so steps stay serialized.  Compares the
    # device's own step rate against the sequential-dispatch protocols: a
    # gap means the host/tunnel enqueue rate, not the chip, bounds A-C.
    K = 25

    @jax.jit
    def fwd_scan(v, x, s0):
        def step(s, _):
            outs = model.apply(v, x + 0.0 * s)
            r = outs[0] + outs[1] + outs[2] + outs[3]
            return jnp.mean(r).astype(jnp.float32), None

        s, _ = jax.lax.scan(step, s0, None, length=K)
        return s

    s = fwd_scan(variables, x, jnp.float32(0))
    jax.block_until_ready(s)
    print(f"protocol D: device-resident scan({K}) per dispatch")
    for n in (2, 4):
        t0 = time.perf_counter()
        for _ in range(n):
            s = fwd_scan(variables, x, s)
        jax.block_until_ready(s)
        report("scan-resident", n * K, time.perf_counter() - t0)

    # 4. device-side truth: profiler trace of 10 steps
    import glob
    import os
    trace_dir = "/tmp/bench_audit_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            out = fwd(variables, x)
        jax.block_until_ready(out)
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"profiler trace written: {files[:1]} (inspect XLA op time there)")


if __name__ == "__main__":
    main()
