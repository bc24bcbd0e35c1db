#!/usr/bin/env python
"""Serving device-stage re-measurement (VERDICT r4 Weak #6).

Measures `serve.BinaryPredictor`'s device stage (forward + on-device
postproc) with the round-4/5 default kernel set at bf16, both postproc
modes, bs=16 — the number BENCH_TABLE's serving section quotes (the stale
1,196 img/s row was the f32 unfused model).
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

from pranet2_tpu.utils.profiling import enable_compile_cache, fence


def main():
    enable_compile_cache()
    from pranet2_tpu.models import get_model
    from pranet2_tpu.serve import BinaryPredictor

    print(f"device: {jax.devices()[0].device_kind}")
    bs, size = 16, 352
    model = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    x0 = jnp.zeros((bs, size, size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((bs, size, size, 3), np.float32))

    for exact in (False, True):
        pred = BinaryPredictor("pranet_v2", variables, batch_size=bs,
                               dtype=jnp.bfloat16, exact_postproc=exact,
                               host_workers=0)
        out = pred._fwd(pred.variables, xb)
        fence(out)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(30):
                out = pred._fwd(pred.variables, xb)
            fence(out)
            best = max(best, bs * 30 / (time.perf_counter() - t0))
        mode = "exact (f32 logits out)" if exact else "device postproc->u8"
        print(f"device stage bf16 fused, {mode:24s}: {best:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
