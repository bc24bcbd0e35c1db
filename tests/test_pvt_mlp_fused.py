"""Fused PVT MLP block op (ops/pvt_mlp.py).

CPU exercises the XLA fallback (`reference_mlp_block`) — equality with the
flax module chain proves the shared-param wiring in `pvtv2._Block` is
right.  The Pallas TPU kernel itself is validated on-chip by
`test_kernel_matches_reference_tpu` (skipped off-TPU; run via
``JAX_PLATFORMS='' pytest -m tpu``) and by the bench parity checks.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.ops.pvt_mlp import (_gelu_erf, fused_mlp_block,
                                     reference_mlp_block)

_NOT_CPU_FALLBACK = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="CPU-fallback structural test (f32 tolerance); on TPU the flag "
    "routes to the compiled bf16-tap kernels, whose parity is gated by the "
    "dedicated *_tpu tests at calibrated tolerance",
)


def _args(rng, n=2, h=12, w=10, d=64, c=256, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dtype)
    mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    return (x, mk((d,), 0.1) + 1.0, mk((d,), 0.1), mk((d, c), 0.05),
            mk((c,), 0.1), mk((3, 3, c), 0.2), mk((c,), 0.1),
            mk((c, d), 0.05), mk((d,), 0.1))


def _module_chain(x, lns, lnb, w1, b1, dwk, dwb, w2, b2):
    """The unfused flax composition from pvtv2._Block / _Mlp."""
    n, h, w, d = x.shape
    y = (x.astype(jnp.float32) - jnp.mean(x.astype(jnp.float32), -1,
                                          keepdims=True))
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    y = y.astype(x.dtype)
    y = y @ w1.astype(x.dtype) + b1.astype(x.dtype)
    c = w1.shape[-1]
    y = jax.lax.conv_general_dilated(
        y, dwk.reshape(3, 3, 1, c).astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c) + dwb.astype(x.dtype)
    y = nn.gelu(y, approximate=False)
    y = y @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return x + y


@_NOT_CPU_FALLBACK
def test_fallback_matches_module_chain(rng):
    a = _args(rng)
    got = np.asarray(jax.jit(fused_mlp_block)(*a))
    want = np.asarray(jax.jit(_module_chain)(*a))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_gelu_poly_accuracy():
    x = jnp.linspace(-12.0, 12.0, 100001)
    want = nn.gelu(x, approximate=False)
    err = np.abs(np.asarray(_gelu_erf(x)) - np.asarray(want))
    # error stays well under bf16 resolution at every magnitude: constant
    # ~1e-3 inside the clip range, ~7e-4*|x| in the saturated tail
    # (resolution there is 2^-8*|x| ~ 3.9e-3*|x|)
    rel = err / np.maximum(np.abs(np.asarray(x)), 1.0)
    assert rel.max() < 1.5e-3
    assert err[np.abs(np.asarray(x)) < 3.5].max() < 1.6e-3


@_NOT_CPU_FALLBACK
def test_grad_path_works(rng):
    a = _args(rng, n=1, h=6, w=5, d=32, c=64)

    def loss(*args):
        return jnp.sum(jnp.sin(fused_mlp_block(*args)))

    def loss_ref(*args):
        return jnp.sum(jnp.sin(reference_mlp_block(*args)))

    g = jax.grad(loss, argnums=(0, 3, 5, 7))(*a)
    gr = jax.grad(loss_ref, argnums=(0, 3, 5, 7))(*a)
    for x, y in zip(g, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@_NOT_CPU_FALLBACK
def test_pvtv2_fused_flag_same_params_and_outputs(rng):
    """fused_mlp=True must not change the param tree; on CPU (fallback) the
    f32 outputs must agree with the module chain to float tolerance."""
    from pranet2_tpu.models.backbones.pvtv2 import PVT_CONFIGS, PVTv2

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m0 = PVTv2(**PVT_CONFIGS["b0"], fused_mlp=False)
    m1 = PVTv2(**PVT_CONFIGS["b0"], fused_mlp=True)
    v = jax.jit(m0.init)(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(
        jax.jit(m1.init)(jax.random.key(0), x))
    o0 = jax.jit(m0.apply)(v, x)
    o1 = jax.jit(m1.apply)(v, x)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_kernel_matches_reference_tpu(rng):
    for (n, h, w, d, c) in [(2, 88, 88, 64, 512), (2, 44, 44, 128, 1024),
                            (2, 22, 22, 320, 1280), (2, 11, 11, 512, 2048)]:
        a = _args(rng, n, h, w, d, c, dtype=jnp.bfloat16)
        got = np.asarray(jax.jit(fused_mlp_block)(*a), np.float32)
        want = np.asarray(jax.jit(reference_mlp_block)(*a), np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.04 * max(scale / 4, 1.0), (n, c)


# ---------------- fused SRA attention (ops/pvt_attn.py) ----------------

def _attn_args(rng, n=2, h=12, w=10, d=64, nh=2, sr=2, dtype=jnp.float32):
    hd = d // nh
    tkv = (h // sr) * (w // sr)
    mk = lambda s, sc=0.1: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dtype)
    return (x, mk((d,)) + 1.0, mk((d,)), mk((nh, d, hd), 0.05),
            mk((nh, hd)), mk((n, nh, hd, tkv), 0.5),
            mk((n, nh, tkv, hd), 0.5), mk((d, d), 0.05), mk((d,)))


@_NOT_CPU_FALLBACK
def test_attn_fallback_matches_dot_product_attention(rng):
    """reference_sra_attention == LN + jax.nn.dot_product_attention + proj."""
    from pranet2_tpu.ops.pvt_attn import reference_sra_attention

    a = _attn_args(rng)
    x, lns, lnb, wq, bq, kt, v, wp, bp = a
    n, h, w, d = x.shape
    nh, _, hd = wq.shape
    got = np.asarray(jax.jit(reference_sra_attention)(*a))

    y = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": lns, "bias": lnb}}, x).reshape(n, h * w, d)
    q = (y @ wq.transpose(1, 0, 2).reshape(d, d)).reshape(n, h * w, nh, hd)
    q = q + bq.reshape(-1)[None, None].reshape(1, 1, nh, hd)
    k = kt.transpose(0, 3, 1, 2)   # (n, tkv, nh, hd)
    vv = v.transpose(0, 2, 1, 3)
    o = jax.nn.dot_product_attention(q, k, vv)
    want = x + (o.reshape(n, h * w, d) @ wp + bp).reshape(n, h, w, d)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5, rtol=1e-5)


@_NOT_CPU_FALLBACK
def test_attn_grad_path_works(rng):
    from pranet2_tpu.ops.pvt_attn import (fused_sra_attention,
                                          reference_sra_attention)

    a = _attn_args(rng, n=1, h=6, w=4, d=32, nh=2, sr=2)
    g = jax.grad(lambda *A: jnp.sum(jnp.sin(fused_sra_attention(*A))),
                 argnums=(0, 3, 7))(*a)
    gr = jax.grad(lambda *A: jnp.sum(jnp.sin(reference_sra_attention(*A))),
                  argnums=(0, 3, 7))(*a)
    for x, y in zip(g, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@_NOT_CPU_FALLBACK
def test_pvtv2_fused_attn_same_params_and_outputs(rng):
    from pranet2_tpu.models.backbones.pvtv2 import PVT_CONFIGS, PVTv2

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m0 = PVTv2(**PVT_CONFIGS["b0"], fused_mlp=False, fused_attn=False)
    m1 = PVTv2(**PVT_CONFIGS["b0"], fused_mlp=True, fused_attn=True)
    v = jax.jit(m0.init)(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(
        jax.jit(m1.init)(jax.random.key(0), x))
    o0 = jax.jit(m0.apply)(v, x)
    o1 = jax.jit(m1.apply)(v, x)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_attn_kernel_matches_reference_tpu(rng):
    from pranet2_tpu.ops.pvt_attn import (fused_sra_attention,
                                          reference_sra_attention)

    for (n, h, w, d, nh, sr) in [(2, 88, 88, 64, 1, 8),
                                 (2, 44, 44, 128, 2, 4),
                                 (2, 22, 22, 320, 5, 2),
                                 (2, 11, 11, 512, 8, 1)]:
        a = _attn_args(rng, n, h, w, d, nh, sr, dtype=jnp.bfloat16)
        got = np.asarray(jax.jit(fused_sra_attention)(*a), np.float32)
        want = np.asarray(jax.jit(reference_sra_attention)(*a), np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.04 * max(scale / 4, 1.0), (n, d)


# ------------- fused SRA block v2 (whole attention half in-kernel) -------


def _block_args(rng, n=2, h=12, w=8, d=64, nh=2, sr=2, dtype=jnp.float32):
    mk = lambda s, sc=0.1: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    hd = d // nh
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dtype)
    if sr > 1:
        wsr, lks, lkb = mk((sr * sr * d, d), 0.05), mk((d,)) + 1.0, mk((d,))
    else:
        wsr = jnp.zeros((1, d), jnp.float32)
        lks, lkb = jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32)
    return (x, mk((d,)) + 1.0, mk((d,)), mk((nh, d, hd), 0.05), mk((nh, hd)),
            wsr, mk((d,)), lks, lkb, mk((d, 2 * d), 0.05), mk((2 * d,)),
            mk((d, d), 0.05), mk((d,)))


@_NOT_CPU_FALLBACK
def test_sra_block_fallback_matches_module_chain(rng):
    """reference_sra_block == the unfused flax composition in pvtv2."""
    from pranet2_tpu.ops.pvt_attn import reference_sra_block

    for sr, nh in [(2, 2), (1, 4)]:
        a = _block_args(rng, sr=sr, nh=nh)
        (x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp) = a
        n, h, w, d = x.shape
        hd = d // nh
        got = np.asarray(jax.jit(
            lambda *A: reference_sra_block(*A, sr=sr, nh=nh))(*a))

        y = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": lns, "bias": lnb}}, x)
        if sr > 1:
            kvi = jax.lax.conv_general_dilated(
                y, wsr.reshape(sr, sr, d, d), (sr, sr), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bsr
            kvi = nn.LayerNorm(epsilon=1e-5).apply(
                {"params": {"scale": lks, "bias": lkb}}, kvi)
            kvi = kvi.reshape(n, -1, d)
        else:
            kvi = y.reshape(n, h * w, d)
        kv = kvi @ wkv + bkv
        k, v = kv[..., :d], kv[..., d:]
        tkv = k.shape[1]
        q = (y.reshape(n, h * w, d) @ wq.transpose(1, 0, 2).reshape(d, d))
        q = q.reshape(n, h * w, nh, hd) + bq.reshape(1, 1, nh, hd)
        o = jax.nn.dot_product_attention(
            q, k.reshape(n, tkv, nh, hd), v.reshape(n, tkv, nh, hd))
        want = x + (o.reshape(n, h * w, d) @ wp + bp).reshape(n, h, w, d)
        np.testing.assert_allclose(got, np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


@_NOT_CPU_FALLBACK
def test_sra_block_grad_path_works(rng):
    from pranet2_tpu.ops.pvt_attn import (fused_sra_block,
                                          reference_sra_block)

    a = _block_args(rng, n=1, h=6, w=4, d=32, nh=2, sr=2)
    g = jax.grad(
        lambda *A: jnp.sum(jnp.sin(fused_sra_block(*A, 2, 2))),
        argnums=(0, 3, 5, 9, 11))(*a)
    gr = jax.grad(
        lambda *A: jnp.sum(jnp.sin(reference_sra_block(*A, sr=2, nh=2))),
        argnums=(0, 3, 5, 9, 11))(*a)
    for x, y in zip(g, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_sra_block_kernel_matches_reference_tpu(rng):
    from pranet2_tpu.ops.pvt_attn import (fused_sra_block,
                                          reference_sra_block)

    for (n, h, w, d, nh, sr) in [(2, 88, 88, 64, 1, 8),
                                 (2, 44, 44, 128, 2, 4),
                                 (2, 22, 22, 320, 5, 2),
                                 (2, 11, 11, 512, 8, 1)]:
        a = _block_args(rng, n, h, w, d, nh, sr, dtype=jnp.bfloat16)
        got = np.asarray(jax.jit(
            lambda *A: fused_sra_block(*A, sr, nh))(*a), np.float32)
        want = np.asarray(jax.jit(
            lambda *A: reference_sra_block(*A, sr=sr, nh=nh))(*a),
            np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.04 * max(scale / 4, 1.0), (d,)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-model fused-path parity needs the chip")
@pytest.mark.parametrize("model_name", ["pvt_pranet_v2", "pranet_v2"])
def test_full_model_fused_vs_unfused_tpu(rng, model_name, monkeypatch):
    """End-to-end guard for the driver bench: the bf16 fused auto path
    (Pallas MLP/attention kernels, s2d stem) must match the plain-XLA
    bf16 model (PRANET2_NO_FUSED=1) on the same params at bf16 tolerance,
    at the real benchmark shape."""
    from pranet2_tpu.models import get_model

    x = jnp.asarray(rng.standard_normal((2, 352, 352, 3)), jnp.float32)
    monkeypatch.delenv("PRANET2_NO_FUSED", raising=False)
    m = get_model(model_name, num_class=1, dtype=jnp.bfloat16)
    v = jax.jit(m.init)(jax.random.key(0), x)
    fused = [np.asarray(o, np.float32) for o in jax.jit(m.apply)(v, x)]
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    m2 = get_model(model_name, num_class=1, dtype=jnp.bfloat16)
    plain = [np.asarray(o, np.float32) for o in jax.jit(m2.apply)(v, x)]
    for a, b in zip(fused, plain):
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() / scale < 0.08, model_name


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused train-step parity needs the chip")
def test_train_step_fused_vs_unfused_tpu(rng, monkeypatch):
    """bf16 TRAIN step (value_and_grad through the Pallas custom VJPs) must
    match the plain-XLA bf16 step on the same params: loss and parameter
    gradients at bf16 tolerance (VERDICT r3 #5 — the fused path extends to
    training, not just inference)."""
    from pranet2_tpu.losses import structure_loss
    from pranet2_tpu.models import get_model

    x = jnp.asarray(rng.standard_normal((2, 352, 352, 3)), jnp.float32)
    gts = jnp.asarray((rng.random((2, 352, 352, 1)) > 0.5)
                      .astype(np.float32))

    def grads_for(no_fused):
        if no_fused:
            monkeypatch.delenv("PRANET2_FUSED", raising=False)
            monkeypatch.setenv("PRANET2_NO_FUSED", "1")
        else:
            monkeypatch.delenv("PRANET2_NO_FUSED", raising=False)
            # training defaults to the XLA chain (round-5 decision);
            # an explicit PRANET2_FUSED opts the kernels into train,
            # which is exactly what this parity test exercises
            monkeypatch.setenv("PRANET2_FUSED",
                               "mlp,attn,s2d,s2dmax,pes2d,gstage")
        m = get_model("pvt_pranet_v2", num_class=1, dtype=jnp.bfloat16)
        v = jax.jit(m.init)(jax.random.key(0), x)

        def lf(p):
            o, _ = m.apply({"params": p, **{k: v[k] for k in v
                                            if k != "params"}}, x, True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.key(0)})
            bg = 1.0 - gts
            return sum(structure_loss(f, b, gts, bg)
                       for f, b in zip(o[:4], o[4:]))

        loss, g = jax.jit(jax.value_and_grad(lf))(v["params"])
        return float(loss), g

    loss_f, g_f = grads_for(False)
    loss_p, g_p = grads_for(True)
    assert np.isfinite(loss_f) and np.isfinite(loss_p)
    assert abs(loss_f - loss_p) / max(abs(loss_p), 1.0) < 0.05
    flat_f = jax.tree.leaves(g_f)
    flat_p = jax.tree.leaves(g_p)
    # global gradient direction must agree (per-leaf bf16 noise is large on
    # tiny tensors; the training signal is the aggregate)
    num = sum(float(jnp.vdot(a.astype(jnp.float32), b.astype(jnp.float32)))
              for a, b in zip(flat_f, flat_p))
    na = sum(float(jnp.vdot(a.astype(jnp.float32), a.astype(jnp.float32)))
             for a in flat_f) ** 0.5
    nb = sum(float(jnp.vdot(b.astype(jnp.float32), b.astype(jnp.float32)))
             for b in flat_p) ** 0.5
    assert num / (na * nb) > 0.99, (num / (na * nb), loss_f, loss_p)


# ---------------- whole-block fusion (ops/pvt_block.py) ----------------


@_NOT_CPU_FALLBACK
def test_pvtv2_fused_block_flag_same_params_and_outputs(rng):
    """fused_block=True must not change the param tree; on CPU (fallback)
    the f32 outputs must agree with the module chain."""
    from pranet2_tpu.models.backbones.pvtv2 import PVT_CONFIGS, PVTv2

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m0 = PVTv2(**PVT_CONFIGS["b0"], fused_block=False, fused_mlp=False,
               fused_attn=False)
    m1 = PVTv2(**PVT_CONFIGS["b0"], fused_block=True)
    v = jax.jit(m0.init)(jax.random.key(0), x)
    v1 = jax.jit(m1.init)(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v1)):
        assert a.shape == b.shape
    o0 = jax.jit(m0.apply)(v, x)
    o1 = jax.jit(m1.apply)(v, x)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_pvt_block_kernel_matches_reference_tpu(rng):
    from pranet2_tpu.ops.pvt_block import fused_pvt_block, reference_pvt_block

    for (n, h, w, d, c, nh, sr) in [(2, 88, 88, 64, 512, 1, 8),
                                    (2, 44, 44, 128, 1024, 2, 4),
                                    (2, 22, 22, 320, 1280, 5, 2),
                                    (2, 11, 11, 512, 2048, 8, 1)]:
        a = _block_args(rng, n, h, w, d, nh, sr, dtype=jnp.bfloat16)
        mk = lambda s, sc=0.1: jnp.asarray(rng.standard_normal(s) * sc,
                                           jnp.float32)
        a = a + (mk((d,)) + 1.0, mk((d,)), mk((d, c), 0.05), mk((c,)),
                 mk((3, 3, c)), mk((c,)), mk((c, d), 0.05), mk((d,)))
        got = np.asarray(jax.jit(
            lambda *A: fused_pvt_block(*A, sr, nh))(*a), np.float32)
        want = np.asarray(jax.jit(
            lambda *A: reference_pvt_block(*A, sr=sr, nh=nh))(*a),
            np.float32)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() <= 0.05 * max(scale / 4, 1.0), (d,)


def test_saved_vjp_matches_recompute_vjp(monkeypatch):
    """Residual-saving VJP (PVT_MLP_BWD=saved) == the full-recompute VJP
    on every input/param grad (f32, CPU fallback path)."""
    import pranet2_tpu.ops.pvt_mlp as pm

    rng = np.random.default_rng(21)
    n, h, w, d, c = 2, 6, 8, 16, 32
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    args = (jnp.asarray(rng.standard_normal((n, h, w, d)), jnp.float32),
            mk((d,)) + 1.0, mk((d,)), mk((d, c)), mk((c,)),
            mk((3, 3, c)), mk((c,)), mk((c, d)), mk((d,)))

    def loss(*a):
        return (pm.fused_mlp_block(*a) ** 2).sum()

    monkeypatch.setenv("PVT_MLP_BWD", "saved")
    gs = jax.grad(loss, argnums=tuple(range(9)))(*args)
    monkeypatch.setenv("PVT_MLP_BWD", "recompute")
    gr = jax.grad(loss, argnums=tuple(range(9)))(*args)
    for a, b in zip(gs, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-6) < 2e-5
