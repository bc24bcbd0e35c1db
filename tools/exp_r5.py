#!/usr/bin/env python
"""Round-5 A/B measurements: MLP fc1 strategy + Bottle2neck tailfuse.

One process, trace-time env knobs, fresh jit per variant (the
exp_pvt_matrix pattern).  Fenced protocol identical to cli/benchmark.

Usage:
    python tools/exp_r5.py pvt     # PVT-PraNet-V2: fc1 once vs per_tap
    python tools/exp_r5.py conv    # PraNet-V2: tailfuse on vs off
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pranet2_tpu.utils.profiling import enable_compile_cache, fence


def bench_fwd(model, bs=16, size=352, iters=40, windows=3, warmup=5):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, size, size, 3), np.float32))
    v = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def fwd(v, x):
        o = model.apply(v, x)
        return o[0] + o[1] + o[2] + o[3]

    out = None
    for _ in range(warmup):
        out = fwd(v, x)
    fence(out)
    best = 0.0
    samples = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(v, x)
        fence(out)
        dt = time.perf_counter() - t0
        samples.append(bs * iters / dt)
    best = max(samples)
    return best, samples


def main():
    from pranet2_tpu.models import get_model

    enable_compile_cache()
    which = _sys.argv[1] if len(_sys.argv) > 1 else "pvt"
    if which == "pvt":
        cases = [
            ("fc1=once (new default)", "pvt_pranet_v2",
             {"PVT_MLP_FC1": "once"}),
            ("fc1=per_tap (round-4)", "pvt_pranet_v2",
             {"PVT_MLP_FC1": "per_tap"}),
        ]
    elif which == "conv":
        base = "mlp,attn,s2d,s2dmax,pes2d,gstage"
        cases = [
            ("tailfuse ON (new default)", "pranet_v2",
             {"PRANET2_FUSED": base + ",tailfuse"}),
            ("tailfuse OFF (round-4)", "pranet_v2",
             {"PRANET2_FUSED": base}),
        ]
    elif which == "splitmm":
        base = "mlp,attn,s2d,s2dmax,pes2d,gstage"
        cases = [
            ("splitmm ON", "pranet_v2", {"PRANET2_FUSED": base + ",splitmm"}),
            ("splitmm OFF (round-4)", "pranet_v2", {"PRANET2_FUSED": base}),
        ]
    elif which == "decdot":
        base = "mlp,attn,s2d,s2dmax,pes2d,gstage"
        cases = [
            ("decdot ON", "pranet_v2", {"PRANET2_FUSED": base + ",decdot"}),
            ("decdot ON", "pvt_pranet_v2", {"PRANET2_FUSED": base + ",decdot"}),
        ]
    elif which == "attnroute":
        cases = [
            ("attn v1 everywhere (default)", "pvt_pranet_v2",
             {"PVT_ATTN_IMPL": "v1"}),
            ("attn auto:1 (v2 at stage 4)", "pvt_pranet_v2",
             {"PVT_ATTN_IMPL": "auto:1"}),
            ("attn auto:2 (v2 at stages 3-4)", "pvt_pranet_v2",
             {"PVT_ATTN_IMPL": "auto:2"}),
        ]
    elif which == "lnstats":
        base = "mlp,attn,s2d,s2dmax,pes2d,gstage"
        cases = [
            ("lnstats ON", "pvt_pranet_v2",
             {"PRANET2_FUSED": base + ",lnstats"}),
            ("lnstats OFF", "pvt_pranet_v2", {"PRANET2_FUSED": base}),
        ]
    else:
        raise SystemExit(f"unknown mode {which}")
    print(f"device: {jax.devices()[0].device_kind}")
    for tag, name, env in cases:
        for k, v in env.items():
            os.environ[k] = v
        kwargs = {"num_class": 1} if name.endswith("_v2") else {}
        model = get_model(name, dtype=jnp.bfloat16, **kwargs)
        best, samples = bench_fwd(model)
        print(f"{tag:28s} {name} bs16: best {best:7.1f} img/s  "
              f"windows {[round(s, 1) for s in samples]}", flush=True)
        for k in env:
            del os.environ[k]


if __name__ == "__main__":
    main()
