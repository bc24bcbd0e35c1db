"""Depthwise-3x3 op: exactness vs a numpy stencil, grads vs XLA autodiff.

CPU backend exercises the XLA fallback path (the Pallas TPU path is driven
on-chip; its exactness finding is documented in ops/dwconv.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.ops.dwconv import _xla_dwconv, depthwise_conv3x3


def numpy_dw(x, w):
    n, h, wd, c = x.shape
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(x)
    for di in range(3):
        for dj in range(3):
            out += xp[:, di:di + h, dj:dj + wd, :] * w[di, dj]
    return out


@pytest.mark.parametrize("shape,c", [((2, 16, 24, 128), 128),
                                     ((1, 9, 13, 64), 64)])
def test_matches_numpy_stencil(rng, shape, c):
    x = rng.standard_normal(shape, dtype=np.float32)
    w = rng.standard_normal((3, 3, c), dtype=np.float32)
    got = np.asarray(jax.jit(depthwise_conv3x3)(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, numpy_dw(x, w), atol=1e-5)


def test_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 128), dtype=np.float32))

    def loss(fn):
        return jax.grad(lambda x, w: jnp.sum(jnp.sin(fn(x, w))),
                        argnums=(0, 1))(x, w)

    for a, b in zip(loss(depthwise_conv3x3), loss(_xla_dwconv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_path(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 128), dtype=np.float32))
    got = depthwise_conv3x3(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        numpy_dw(np.asarray(x), np.asarray(w)), atol=0.15)
