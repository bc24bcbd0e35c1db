"""Inference FPS benchmark across models and batch sizes.

Equivalent of the reference's Jittor benchmark protocol
(``binary_seg/jittor/MyTest.py:63-123``: timing brackets only the forward).
Prints a table matching ``binary_seg/jittor/README.md:87-127`` so the numbers
are directly comparable to the PyTorch/Jittor columns.

Methodology (same as the repo-root ``bench.py``): warmup passes to settle the
device/tunnel, then N timing windows of ``--iters`` sequential dispatches with
one block at the end; best and median windows are both reported.  The device
kind, the chip's published peak bf16 FLOP/s, and model FLOPs from the
compiled HLO (``utils/profiling.cost_analysis``) give an honest MFU%.
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np
from tabulate import tabulate

REFERENCE_FPS = {  # PyTorch baseline, bs 1/4/8/16 (jittor/README.md)
    "pranet_v1": (32, 165, 328, 642),
    "pvt_pranet_v1": (28, 138, 261, 541),
    "pranet_v2": (31, 143, 283, 556),
    "pvt_pranet_v2": (29, 130, 241, 493),
}

def bench_model(name: str, batch_sizes, size: int, iters: int, dtype: str,
                windows: int = 3, warmup: int = 5, with_flops: bool = True):
    import jax
    import jax.numpy as jnp

    from pranet2_tpu.models import get_model
    from pranet2_tpu.utils.profiling import (cost_analysis,
                                             enable_compile_cache, fence)

    enable_compile_cache()

    dt = jnp.bfloat16 if dtype == "bfloat16" else None
    kwargs = {"num_class": 1} if name.endswith("_v2") else {}
    model = get_model(name, dtype=dt, **kwargs)
    rng = np.random.default_rng(0)
    results = []
    for bs in batch_sizes:
        x = jnp.asarray(
            rng.standard_normal((bs, size, size, 3), dtype=np.float32)
        )
        variables = jax.jit(model.init)(jax.random.key(0), x)

        @jax.jit
        def fwd(v, x):
            # Reference inference semantics (binary_seg/MyTest_med.py:104-108):
            # V2 sums the 4 fg maps (bg maps are dead code XLA eliminates);
            # V1 consumes only the res2 (finest) map.  This is the SAME
            # program bench.py times — one benchmark, one number.
            outs = model.apply(v, x)
            if name.endswith("_v2"):
                return outs[0] + outs[1] + outs[2] + outs[3]
            return outs[3]

        out = None
        for _ in range(max(warmup, 1)):  # >=1: compile before timing
            out = fwd(variables, x)
        fence(out)
        fps = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, x)
            fence(out)
            fps.append(bs * iters / (time.perf_counter() - t0))
        gflop_img = None
        if with_flops:
            try:
                cost = cost_analysis(fwd, variables, x)
                if cost["flops"] and cost["flops"] > 0:
                    gflop_img = cost["flops"] / bs / 1e9
            except Exception:
                pass
        results.append(dict(best=max(fps), median=statistics.median(fps),
                            gflop_img=gflop_img))
    return results


def main():
    from pranet2_tpu.utils.profiling import device_peak_tflops

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["pranet_v1", "pvt_pranet_v1",
                            "pranet_v2", "pvt_pranet_v2"])
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 4, 8, 16])
    p.add_argument("--testsize", type=int, default=352)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    kind, peak = device_peak_tflops()
    print(f"device_kind: {kind}"
          + (f"  (peak bf16 ~{peak:.0f} TFLOP/s)" if peak else
             "  (peak unknown — MFU omitted)"))

    rows = []
    for name in args.models:
        try:
            res = bench_model(name, args.batch_sizes, args.testsize,
                              args.iters, args.dtype, windows=args.windows)
        except Exception as e:
            # a fused-kernel compile failure on one model must not kill the
            # whole table; report it and keep benchmarking the rest
            print(f"{name}: FAILED ({type(e).__name__}: {e})")
            continue
        ref = REFERENCE_FPS.get(name)
        for bs, r in zip(args.batch_sizes, res):
            row = dict(model=name, bs=bs, fps=round(r["best"], 1),
                       fps_median=round(r["median"], 1))
            if r["gflop_img"]:
                row["gflop_img"] = round(r["gflop_img"], 1)
                tflops = r["best"] * r["gflop_img"] / 1e3
                row["tflops"] = round(tflops, 1)
                if peak:
                    row["mfu_pct"] = round(100 * tflops / peak, 1)
            if ref is not None and bs in (1, 4, 8, 16):
                row["torch_fps"] = ref[(1, 4, 8, 16).index(bs)]
                row["speedup"] = round(r["best"] / row["torch_fps"], 2)
            rows.append(row)
    headers = ["model", "bs", "fps", "fps_median", "gflop_img", "tflops",
               "mfu_pct", "torch_fps", "speedup"]
    print(tabulate([[r.get(h, "") for h in headers] for r in rows],
                   headers=headers))


if __name__ == "__main__":
    main()
