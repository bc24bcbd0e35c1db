"""Numeric parity of attention implementations vs torch primitives.

These pin down the weight-packing conventions the checkpoint converter relies
on: MaxViT's interleaved per-head qkv Linear, and MIST's torch
``nn.MultiheadAttention`` packed in-proj.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.oracle


def test_maxvit_attention_qkv_packing(rng):
    """AttentionCl with converted torch qkv/proj weights == torch math."""
    from pranet2_tpu.models.backbones.maxvit import AttentionCl
    from pranet2_tpu.utils.torch_convert import convert_state_dict

    dim, win, heads, hd = 64, 4, 2, 32
    tqkv = torch.nn.Linear(dim, 3 * dim, bias=True)
    tproj = torch.nn.Linear(dim, dim, bias=True)
    x = rng.standard_normal((3, win, win, dim), dtype=np.float32)

    # torch-side computation, matching the reference AttentionCl forward
    # (maxxvit_4out.py:758-776) exactly (no rel-pos for this test)
    with torch.no_grad():
        tx = torch.from_numpy(x.reshape(3, win * win, dim))
        q, k, v = (
            tqkv(tx).view(3, -1, heads, hd * 3).transpose(1, 2).chunk(3, dim=3)
        )
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(3, win * win, dim)
        want = tproj(out).numpy().reshape(3, win, win, dim)

    sd = {**{f"qkv.{k}": v.detach().numpy() for k, v in tqkv.state_dict().items()},
          **{f"proj.{k}": v.detach().numpy() for k, v in tproj.state_dict().items()}}
    fvars = convert_state_dict(sd, lambda p: (p,))

    m = AttentionCl(dim, win)
    init = m.init(jax.random.key(0), jnp.asarray(x))
    # zero the rel-pos MLP so its bias contribution vanishes
    params = dict(init["params"])
    params["rel_pos"] = jax.tree.map(jnp.zeros_like, params["rel_pos"])
    params["qkv"] = fvars["params"]["qkv"]
    params["proj"] = fvars["params"]["proj"]
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_mist_attention_packed_mha(rng):
    """_ConvAttention's MHA part with split in-proj == torch MultiheadAttention."""
    from pranet2_tpu.utils.torch_convert import convert_state_dict, split_packed_mha
    import flax.linen as nn

    c, heads = 32, 4
    tmha = torch.nn.MultiheadAttention(embed_dim=c, num_heads=heads,
                                       bias=True, batch_first=True)
    x = rng.standard_normal((2, 9, c), dtype=np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        want = tmha(query=tx, key=tx, value=tx, need_weights=False)[0].numpy()

    sd = split_packed_mha(
        {f"attention.{k}": v.detach().numpy() for k, v in tmha.state_dict().items()}
    )
    fvars = convert_state_dict(sd, lambda p: tuple(p.split(".")[1:]))

    class MHA(nn.Module):
        @nn.compact
        def __call__(self, x):
            n, l, _ = x.shape
            hd = c // heads
            q = nn.Dense(c, name="in_proj_q")(x).reshape(n, l, heads, hd)
            k = nn.Dense(c, name="in_proj_k")(x).reshape(n, l, heads, hd)
            v = nn.Dense(c, name="in_proj_v")(x).reshape(n, l, heads, hd)
            o = jax.nn.dot_product_attention(q, k, v).reshape(n, l, c)
            return nn.Dense(c, name="out_proj")(o)

    got = np.asarray(MHA().apply(fvars, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pvtv2_sra_attention_parity(rng):
    """PVTv2 SRA attention vs torch primitives (validates q/kv packing)."""
    from pranet2_tpu.models.backbones.pvtv2 import _SRAttention
    from pranet2_tpu.utils.torch_convert import convert_state_dict

    dim, heads, hd = 64, 2, 32
    tq = torch.nn.Linear(dim, dim, bias=True)
    tkv = torch.nn.Linear(dim, 2 * dim, bias=True)
    tproj = torch.nn.Linear(dim, dim, bias=True)
    x = rng.standard_normal((2, 16, dim), dtype=np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x)
        q = tq(tx).reshape(2, 16, heads, hd).permute(0, 2, 1, 3)
        kv = tkv(tx).reshape(2, -1, 2, heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(2, 16, dim)
        want = tproj(out).numpy()

    sd = {**{f"q.{k}": v.detach().numpy() for k, v in tq.state_dict().items()},
          **{f"kv.{k}": v.detach().numpy() for k, v in tkv.state_dict().items()},
          **{f"proj.{k}": v.detach().numpy() for k, v in tproj.state_dict().items()}}
    fvars = convert_state_dict(sd, lambda p: (p,))

    m = _SRAttention(dim=dim, num_heads=heads, sr_ratio=1)
    # module takes NHWC maps; the 16 tokens are a 4x4 map
    got = np.asarray(
        m.apply({"params": fvars["params"]},
                jnp.asarray(x).reshape(2, 4, 4, dim))
    ).reshape(2, 16, dim)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
