"""Profiling & cost analysis (replaces thop FLOPs counting + adds tracing).

Reference equivalents: ``CalParams`` thop counter
(``binary_seg/utils/utils.py:49-62``), ptflops in MIST's __main__, wall-clock
FPS loop (``binary_seg/jittor/MyTest.py:63-123``).  TPU-native versions:

* ``cost_analysis``: FLOPs/bytes from the *compiled* XLA executable — exact
  for the program that actually runs, unlike operator-table counters.
* ``Timer`` / ``throughput``: step-time and images/sec meters that block on
  device results (async dispatch otherwise lies).
* ``trace``: context manager around ``jax.profiler`` for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


# published peak dense bf16 TFLOP/s per device_kind (for MFU bookkeeping)
PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
}


def device_peak_tflops() -> tuple[str, float | None]:
    kind = jax.devices()[0].device_kind
    return kind, PEAK_BF16_TFLOPS.get(kind)


def enable_compile_cache(path: str | None = None) -> None:
    """Point jax at a persistent XLA compilation cache (idempotent).

    Over this image's remote-TPU tunnel a cold compile of a full model is
    minutes; with the cache a repeat ``bench.py`` / tools run is seconds.
    Defaults to the repo-local gitignored ``.jax_cache`` the test suite
    shares (the driver dryrun keeps its own committed ``.dryrun_cache``).
    """
    import os

    if path is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is only an optimization
        pass


def cost_analysis(fn, *args) -> dict:
    """FLOPs / bytes accessed of the jitted ``fn(*args)`` from compiled HLO.

    Already-jitted functions are lowered directly (cache hit — no second
    compile); raw callables are wrapped in ``jax.jit`` first.  Values are
    ``None`` when the backend does not report them.
    """
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    stats = jfn.lower(*args).compile().cost_analysis()
    if isinstance(stats, list):  # some backends return a list per-computation
        stats = stats[0]
    return {
        "flops": stats.get("flops"),
        "bytes_accessed": stats.get("bytes accessed"),
    }


def count_params(variables) -> int:
    tree = variables.get("params", variables)
    return sum(p.size for p in jax.tree.leaves(tree))


def fence(out):
    """HARD completion barrier for timing: D2H-fetch one element.

    Over a remote-device tunnel (this image's axon backend)
    ``jax.block_until_ready`` returns at enqueue-ack, NOT device completion —
    round-1 throughput was inflated ~17x by trusting it (tools/bench_audit.py).
    A tiny transfer cannot return early.  Returns its input.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])
    return out


class Timer:
    """Wall-clock timer that hard-fences on device output."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            fence(out["result"])
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def throughput(fn, args, batch_size: int, iters: int = 50, warmup: int = 2):
    """images/sec of ``fn(*args)``; compiles first, hard-fences at the end."""
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
