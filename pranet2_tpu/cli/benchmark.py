"""Inference FPS benchmark across models and batch sizes.

Equivalent of the reference's Jittor benchmark protocol
(``binary_seg/jittor/MyTest.py:63-123``: timing brackets only the forward).
Prints a table matching ``binary_seg/jittor/README.md:87-127`` so the numbers
are directly comparable to the PyTorch/Jittor columns.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
from tabulate import tabulate

REFERENCE_FPS = {  # PyTorch baseline, bs 1/4/8/16 (jittor/README.md)
    "pranet_v1": (32, 165, 328, 642),
    "pvt_pranet_v1": (28, 138, 261, 541),
    "pranet_v2": (31, 143, 283, 556),
    "pvt_pranet_v2": (29, 130, 241, 493),
}


def bench_model(name: str, batch_sizes, size: int, iters: int, dtype: str):
    import jax
    import jax.numpy as jnp

    from pranet2_tpu.models import get_model

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
            return model.apply(v, x)

        jax.block_until_ready(fwd(variables, x))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        results.append(bs * iters / (time.perf_counter() - t0))
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+",
                   default=["pranet_v1", "pvt_pranet_v1",
                            "pranet_v2", "pvt_pranet_v2"])
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 4, 8, 16])
    p.add_argument("--testsize", type=int, default=352)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    rows = []
    for name in args.models:
        fps = bench_model(name, args.batch_sizes, args.testsize, args.iters,
                          args.dtype)
        ref = REFERENCE_FPS.get(name)
        for bs, f in zip(args.batch_sizes, fps):
            r = dict(model=name, bs=bs, fps=round(f, 1))
            if ref is not None and bs in (1, 4, 8, 16):
                r["torch_fps"] = ref[(1, 4, 8, 16).index(bs)]
                r["speedup"] = round(f / r["torch_fps"], 2)
            rows.append(r)
    headers = ["model", "bs", "fps", "torch_fps", "speedup"]
    print(tabulate([[r.get(h, "") for h in headers] for r in rows],
                   headers=headers))


if __name__ == "__main__":
    main()
