#!/usr/bin/env python
"""PVT-PraNet-V2 bs16 variant matrix: MLP tap dtype x attention kernel
version, one process (all knobs are read at trace time; each variant
builds a fresh model + jit).

Round-3 context: the prior session measured (before the tunnel died)
none 948 -> mlp(f32 taps) 1147 -> +attn v1 1281 img/s; the later
committed bf16-tap + whole-half-v2 variants were never measured and the
first round-3 ablation shows them regressing (mlp 755, attn-v2 962).
This matrix separates the two regressions.
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

from pranet2_tpu.utils.profiling import fence


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
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(v, x)
        fence(out)
        best = max(best, bs * iters / (time.perf_counter() - t0))
    return best


def main():
    from pranet2_tpu.models import get_model

    print(f"device: {jax.devices()[0].device_kind}")
    # (label, PRANET2_FUSED, PVT_MLP_TAPS, PVT_ATTN_IMPL, PVT_MLP_GELU)
    rows = [
        ("mlp/f32+attn-v1",     "mlp,attn", "f32",  "v1", "f32"),
        ("mlp/f32+v1+gelu16",   "mlp,attn", "f32",  "v1", "bf16"),
        ("mlp/bf16+v1+gelu16",  "mlp,attn", "lowp", "v1", "bf16"),
        ("mlp/bf16+attn-v1",    "mlp,attn", "lowp", "v1", "f32"),
        ("mlp/f32+attn-v2",     "mlp,attn", "f32",  "v2", "f32"),
        ("mlp/f32taps",         "mlp",      "f32",  "",   "f32"),
        ("attn-v1",             "attn",     "f32",  "v1", "f32"),
        ("none",                "",         "f32",  "",   "f32"),
    ]
    for label, comps, taps, attn, gelu in rows:
        os.environ["PRANET2_FUSED"] = comps
        os.environ["PVT_MLP_TAPS"] = taps
        os.environ["PVT_ATTN_IMPL"] = attn
        os.environ["PVT_MLP_GELU"] = gelu
        try:
            fps = bench_fwd(get_model("pvt_pranet_v2", num_class=1,
                                      dtype=jnp.bfloat16))
            print(f"{label:18s} {fps:8.1f} img/s", flush=True)
        except Exception as e:
            print(f"{label:18s} FAILED {type(e).__name__}: {e}", flush=True)
    for k in ("PRANET2_FUSED", "PVT_MLP_TAPS", "PVT_ATTN_IMPL",
              "PVT_MLP_GELU"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
