#!/usr/bin/env python
"""Train-step throughput across the zoo with hard-fenced timing.

Replaces the round-1 BENCH_TABLE train rows (measured before the fence fix;
see tools/bench_audit.py for why block_until_ready timing was invalid here).
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
import optax

from pranet2_tpu.utils.profiling import (cost_analysis, enable_compile_cache,
                                         fence)

enable_compile_cache()


def timeit_step(step, state, args, iters=20, warmup=3):
    for _ in range(warmup):
        state, loss = step(state, *args)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, *args)
    fence(loss)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_binary(model_name="pranet_v2", bs=8, size=352, dtype=None):
    from pranet2_tpu.losses import structure_loss
    from pranet2_tpu.models import get_model

    m = get_model(model_name, num_class=1, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, size, size, 3), dtype=np.float32))
    gts = jnp.asarray((rng.random((bs, size, size, 1)) > 0.5)
                      .astype(np.float32))
    v = jax.jit(m.init)(jax.random.key(0), x)
    tx = optax.chain(optax.clip(0.5), optax.adam(1e-4))

    @jax.jit
    def step(state, x, gts):
        params, stats, opt = state

        def lf(p):
            o, u = m.apply({"params": p, "batch_stats": stats}, x, True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(0)})
            return (sum(structure_loss(f, b, gts, 1 - gts)
                        for f, b in zip(o[:4], o[4:])), u["batch_stats"])

        (loss, ns), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt, params)
        return (optax.apply_updates(params, upd), ns, opt2), loss

    state = (v["params"], v["batch_stats"], tx.init(v["params"]))
    ms = timeit_step(step, state, (x, gts))
    cost = cost_analysis(step, state, x, gts)
    return ms, bs / (ms / 1e3), cost


def bench_multiclass(model_name="emcad", bs=6, size=224, ncls=9, dtype=None,
                     remat=False):
    import dataclasses

    import flax.linen as nn

    from pranet2_tpu.losses import mutation_loss
    from pranet2_tpu.models import get_model

    kw = dict(num_classes=ncls, dual=True, dtype=dtype)
    if model_name == "emcad":
        kw["encoder"] = "pvt_v2_b2"
    m = get_model({"emcad": "emcad", "merit": "merit_cascaded",
                   "mist": "mist_cam"}[model_name], **kw)
    if remat:
        # rematerialize the whole forward: activations recomputed in the
        # backward instead of stored — FLOPs traded for HBM residency
        attrs = {f.name: getattr(m, f.name)
                 for f in dataclasses.fields(m)
                 if f.name not in ("parent", "name")}
        m = nn.remat(type(m), static_argnums=(2,))(**attrs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, size, size, 1), dtype=np.float32))
    lab = jnp.asarray(rng.integers(0, ncls, (bs, size, size)))
    v = jax.jit(m.init, static_argnums=2)(jax.random.key(0), x, True)
    tx = optax.adamw(1e-4, weight_decay=1e-4)

    @jax.jit
    def step(state, x, lab):
        params, rest, opt = state

        def lf(p):
            out = m.apply({"params": p, **rest}, x, True,
                          mutable=list(rest.keys()),
                          rngs={"dropout": jax.random.key(0)})
            o, upd = out
            return mutation_loss(o[:4], lab, ncls, o[4:]), dict(upd)

        (loss, new_rest), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt2 = tx.update(g, opt, params)
        return (optax.apply_updates(params, upd), new_rest, opt2), loss

    rest = {k: v[k] for k in v if k != "params"}
    state = (v["params"], rest, tx.init(v["params"]))
    ms = timeit_step(step, state, (x, lab))
    cost = cost_analysis(step, state, x, lab)
    return ms, bs / (ms / 1e3), cost


def _fmt_cost(ms, cost, peak_tflops=None):
    out = []
    if cost.get("flops"):
        tf = cost["flops"] / 1e9 / ms  # GFLOP / ms = TFLOP/s
        out.append(f"{cost['flops']/1e9:.0f} GFLOP -> {tf:.1f} TFLOP/s")
        if peak_tflops:
            out.append(f"MFU {100*tf/peak_tflops:.1f}%")
    if cost.get("bytes_accessed"):
        gb = cost["bytes_accessed"] / 1e9
        out.append(f"{gb:.1f} GB -> {gb/(ms/1e3):.0f} GB/s")
    return ", ".join(out)


def main():
    from pranet2_tpu.utils.profiling import device_peak_tflops

    kind, peak = device_peak_tflops()
    print(f"device: {kind}")
    import os

    for name, bs, dt, fused in [
        ("pranet_v2", 8, None, None), ("pranet_v2", 32, None, None),
        ("pranet_v2", 32, jnp.bfloat16, True),
        ("pranet_v2", 32, jnp.bfloat16, False),
        ("pvt_pranet_v2", 16, None, None),
        # bf16 fused-vs-unfused train ablation (VERDICT r3 #5): the Pallas
        # kernels' custom VJPs run under value_and_grad; env is read at
        # trace time and each row builds a fresh model + jit.
        ("pvt_pranet_v2", 16, jnp.bfloat16, True),
        ("pvt_pranet_v2", 16, jnp.bfloat16, False),
    ]:
        tag = "bf16" if dt is not None else "f32"
        if fused is False:
            os.environ["PRANET2_NO_FUSED"] = "1"
            tag += " unfused"
        elif dt is not None:
            tag += " fused"
        try:
            ms, fps, cost = bench_binary(name, bs=bs, dtype=dt)
        except Exception as e:  # one row's failure must not kill the table
            print(f"{name:16s} bs={bs:3d} {tag}: FAILED "
                  f"{type(e).__name__}: {e}")
            continue
        finally:
            os.environ.pop("PRANET2_NO_FUSED", None)
        print(f"{name:16s} bs={bs:3d} {tag}: {ms:7.2f} ms/step, "
              f"{fps:7.1f} img/s, {_fmt_cost(ms, cost, peak)}")
    for name, bs, size, dt, remat in [
        ("emcad", 6, 224, None, False),
        ("emcad", 6, 224, jnp.bfloat16, False),
        ("emcad", 6, 224, jnp.bfloat16, True),
        ("mist", 4, 224, None, False),
        ("mist", 4, 224, jnp.bfloat16, False),
        ("mist", 4, 224, jnp.bfloat16, True),
    ]:
        tag = ("bf16" if dt is not None else "f32") + ("+remat" if remat else "")
        try:
            ms, fps, cost = bench_multiclass(name, bs=bs, size=size, dtype=dt,
                                             remat=remat)
        except Exception as e:
            print(f"{name:16s} bs={bs:3d} MUTATION dual {tag}: FAILED "
                  f"{type(e).__name__}: {e}")
            continue
        print(f"{name:16s} bs={bs:3d} MUTATION dual {tag}: {ms:7.2f} ms/step, "
              f"{fps:7.1f} img/s, {_fmt_cost(ms, cost, peak)}")


if __name__ == "__main__":
    main()
