#!/usr/bin/env python
"""Device-op-level timing of dwconv candidates via the jax profiler.

Wraps each candidate in a K-iteration fori_loop chain (one dispatch), traces
it, and aggregates XLA-op device time by name — the only measurement on this
image that is immune to BOTH the ~250us/dispatch tunnel overhead AND the
chain-carry cost (the carry ops show up as separate lines we can ignore).
"""

import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo/tools")
from profile_ops import collect_trace, op_table, parse_trace_events  # noqa: E402


def profile_chain(tag, op, x0, K=20, top=6):
    def body(i, c):
        y = op(c)
        return c + (jnp.mean(y) * jnp.asarray(1e-30, c.dtype)).astype(c.dtype)

    f = jax.jit(lambda x: lax.fori_loop(0, K, body, x))
    d = tempfile.mkdtemp(prefix="expprof_")
    collect_trace(f, (x0,), d, iters=1)
    rows, total = op_table(parse_trace_events(d), top=top)
    print(f"== {tag}  (total {total:.2f} ms for {K} chained iters"
          f" = {total/K:.3f} ms/iter incl. carry)")
    for name, (ms, n, shape) in rows:
        print(f"   {ms/K:7.3f} ms/iter {n:4d}x  {name}  {shape[:60]}")


def main():
    rng = np.random.default_rng(0)
    cases = [((16, 88, 88, 64), 512), ((16, 44, 44, 128), 1024),
             ((16, 22, 22, 320), 1280), ((16, 11, 11, 512), 2048)]
    for xshape, c in cases:
        n, h, w, d = xshape
        print(f"--- x{xshape} hidden {c} ---")
        x = jnp.asarray(rng.standard_normal(xshape, dtype=np.float32),
                        jnp.bfloat16)
        W1 = jnp.asarray(rng.standard_normal((d, c), np.float32)
                         / np.sqrt(d), jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal(c, np.float32), jnp.bfloat16)
        wdw = jnp.asarray(rng.standard_normal((3, 3, c), np.float32),
                          jnp.bfloat16)

        def pair(t):
            y = jnp.einsum("nhwd,dc->nhwc", t, W1) + b1
            return lax.conv_general_dilated(
                y, wdw.reshape(3, 3, 1, c), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        K = wdw[:, :, None, :] * W1[None, None, :, :]
        Kb = wdw * b1[None, None, :]
        Kf = jnp.concatenate([K, Kb[:, :, None, :]], axis=2)

        def folded(t):
            ta = jnp.concatenate(
                [t, jnp.ones((n, h, w, 1), t.dtype)], axis=-1)
            return lax.conv_general_dilated(
                ta, Kf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        profile_chain("pair fc1+dwconv", pair, x)
        profile_chain("folded dense 3x3 (+ones)", folded, x)


if __name__ == "__main__":
    main()
