#!/usr/bin/env python
"""Per-component ablation of the round-3 fused paths (run on the TPU).

The driver bench measures the all-fused bf16 path and PRANET2_NO_FUSED=1
measures all-unfused; this script attributes the delta component by
component so the next optimization target is data, not guesswork:

  PVT-PraNet-V2 bs16: none -> mlp -> attn -> mlp+attn
  PraNet-V2 bs16:     none -> s2d stem (-> +fused Bottle2neck with
                      RES2_FUSED_ROW=1; measured negative at the
                      reference widths, kept for re-checks)

Components toggle via PRANET2_FUSED (ops/_pallas.component_enabled),
which the backbones read at trace time — each variant constructs a fresh
model + jit wrapper, so one process measures every variant.  Exception:
PVT_MLP_TAPS=f32 (tap-accumulation dtype) is read at import; run the
script twice to compare taps.

Same fenced protocol as bench.py (sequential dispatch, warmup, best of
3 windows, hard D2H fence).
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

enable_compile_cache()


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

    print(f"device: {jax.devices()[0].device_kind}  "
          f"taps={'lowp' if os.environ.get('PVT_MLP_TAPS') == 'lowp' else 'f32'}")
    rows = [
        ("pvt_pranet_v2", ""),
        ("pvt_pranet_v2", "mlp"),
        ("pvt_pranet_v2", "attn"),
        ("pvt_pranet_v2", "mlp,attn"),
        ("pvt_pranet_v2", "blockfuse"),
        ("pranet_v2", ""),
        ("pranet_v2", "s2d"),
        ("pranet_v2", "s2d,l1pack"),
    ]
    if os.environ.get("RES2_FUSED_ROW"):
        rows.append(("pranet_v2", "s2d,res2block"))
    for model_name, comps in rows:
        os.environ["PRANET2_FUSED"] = comps
        try:
            fps = bench_fwd(get_model(model_name, num_class=1,
                                      dtype=jnp.bfloat16))
            print(f"{model_name:15s} [{comps or 'none':14s}] {fps:8.1f} img/s")
        except Exception as e:  # keep ablating past one variant's failure
            print(f"{model_name:15s} [{comps or 'none':14s}] FAILED "
                  f"{type(e).__name__}: {e}")
    os.environ.pop("PRANET2_FUSED", None)


if __name__ == "__main__":
    main()
