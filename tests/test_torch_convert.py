"""Weight-converter tests: numeric parity on primitives + structural coverage.

The numeric tests drive torch primitive layers (not reference model code) and
assert the converted flax module reproduces them exactly.  The structural
tests synthesise a state_dict with the reference checkpoints' exact key/shape
layout and assert conversion covers the full flax tree.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pranet2_tpu.utils.torch_convert import (
    convert_state_dict,
    normalize_state_dict,
    pranet_key_map,
    pvtv2_key_map,
    res2net_key_map,
)


def to_np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# numeric parity on primitives
# ---------------------------------------------------------------------------


def test_conv_bn_numeric_parity(rng):
    from pranet2_tpu.nn import ConvBN

    tconv = torch.nn.Conv2d(8, 16, 3, padding=2, dilation=2, bias=False)
    tbn = torch.nn.BatchNorm2d(16)
    with torch.no_grad():
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.weight.normal_()
        tbn.bias.normal_()
    tmod = torch.nn.Sequential()
    tmod.add_module("conv", tconv)
    tmod.add_module("bn", tbn)
    tmod.eval()

    sd = to_np_sd(tmod)
    fvars = convert_state_dict(sd, lambda p: (p,))

    m = ConvBN(16, 3, padding=2, dilation=2)
    x = rng.standard_normal((2, 13, 13, 8), dtype=np.float32)
    got = np.asarray(m.apply(fvars, jnp.asarray(x)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=2e-5, rtol=1e-4)


def test_depthwise_conv_and_linear_parity(rng):
    import flax.linen as nn

    tdw = torch.nn.Conv2d(12, 12, 3, padding=1, groups=12)
    tlin = torch.nn.Linear(12, 24)
    sd = {**{f"dw.{k}": v for k, v in to_np_sd(tdw).items()},
          **{f"lin.{k}": v for k, v in to_np_sd(tlin).items()}}
    fvars = convert_state_dict(sd, lambda p: (p,))

    x = rng.standard_normal((1, 9, 9, 12), dtype=np.float32)
    fdw = nn.Conv(12, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=12)
    got = np.asarray(fdw.apply({"params": fvars["params"]["dw"]}, jnp.asarray(x)))
    with torch.no_grad():
        want = tdw(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=2e-5, rtol=1e-4)

    xl = rng.standard_normal((5, 12), dtype=np.float32)
    flin = nn.Dense(24)
    got = np.asarray(flin.apply({"params": fvars["params"]["lin"]}, jnp.asarray(xl)))
    with torch.no_grad():
        want = tlin(torch.from_numpy(xl)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_normalize_state_dict_dataparallel_and_wrappers():
    """Released reference checkpoints can be (a) wrapped in a container dict
    and (b) saved from an ``nn.DataParallel`` wrapper, which prefixes every
    key with ``module.`` (multiclass_seg/EMCAD/trainer.py:77,
    multiclass_seg/MERIT/train_ACDC.py:169,329).  Both must normalize away."""
    t = torch.nn.Sequential()
    t.add_module("conv", torch.nn.Conv2d(3, 8, 3))
    dp = torch.nn.DataParallel(t)
    sd = dp.state_dict()
    assert all(k.startswith("module.") for k in sd)

    for wrapped in (sd, {"state_dict": sd}, {"model": sd}):
        out = normalize_state_dict(wrapped)
        assert set(out) == {"conv.weight", "conv.bias"}
        np.testing.assert_array_equal(
            out["conv.weight"], sd["module.conv.weight"].numpy())

    # an end-to-end convert of the DataParallel dict must equal the bare one
    bare = normalize_state_dict(t.state_dict())
    f1 = convert_state_dict(normalize_state_dict(dp.state_dict()),
                            lambda p: (p,))
    f2 = convert_state_dict(bare, lambda p: (p,))
    jax.tree.map(np.testing.assert_array_equal, f1, f2)


def test_normalize_state_dict_partial_module_prefix_untouched():
    """Only strip ``module.`` when EVERY key has it — a model that happens to
    contain a submodule literally named ``module`` must not be mangled."""
    sd = {"module.conv.weight": np.zeros((1, 1, 1, 1), np.float32),
          "other.weight": np.zeros((1,), np.float32)}
    out = normalize_state_dict(sd)
    assert set(out) == set(sd)


def test_convert_nonstrict_logs_skipped(caplog):
    import logging

    sd = {"mystery.weight": np.zeros((4, 4), np.float32)}
    with caplog.at_level(logging.WARNING):
        out = convert_state_dict(sd, lambda p: None, strict=False)
    assert out == {"params": {}}
    assert any("no flax mapping" in r.message for r in caplog.records)


# ---------------------------------------------------------------------------
# structural coverage: synthetic state dicts with the reference key layout
# ---------------------------------------------------------------------------


def synth_res2net_sd(layers=(3, 4, 6, 3)):
    """Key/shape layout of the res2net50_v1b_26w_4s checkpoint."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.bias"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.random.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0)

    def conv(prefix, o, i, k):
        sd[f"{prefix}.weight"] = np.random.rand(o, i, k, k).astype(np.float32) * 0.01

    conv("conv1.0", 32, 3, 3); bn("conv1.1", 32)
    conv("conv1.3", 32, 32, 3); bn("conv1.4", 32)
    conv("conv1.6", 64, 32, 3); bn("bn1", 64)
    inplanes = 64
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers), 1):
        width = int(math.floor(planes * 26 / 64))
        for b in range(blocks):
            p = f"layer{li}.{b}"
            conv(f"{p}.conv1", width * 4, inplanes if b == 0 else planes * 4, 1)
            bn(f"{p}.bn1", width * 4)
            for i in range(3):
                conv(f"{p}.convs.{i}", width, width, 3)
                bn(f"{p}.bns.{i}", width)
            conv(f"{p}.conv3", planes * 4, width * 4, 1)
            bn(f"{p}.bn3", planes * 4)
            if b == 0:
                conv(f"{p}.downsample.1", planes * 4, inplanes, 1)
                bn(f"{p}.downsample.2", planes * 4)
        inplanes = planes * 4
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    return sd


def tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


def test_res2net_conversion_structural():
    from pranet2_tpu.models.backbones.res2net import Res2Net

    sd = synth_res2net_sd()
    fvars = convert_state_dict(sd, res2net_key_map)
    m = Res2Net()
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert tree_shapes(fvars["params"]) == tree_shapes(want["params"])
    assert tree_shapes(fvars["batch_stats"]) == tree_shapes(want["batch_stats"])
    # converted weights actually run
    out = m.apply(fvars, jnp.zeros((1, 64, 64, 3)))
    assert out[3].shape == (1, 2, 2, 2048)


def synth_pvtv2_sd(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
                   mlp_ratios=(8, 8, 4, 4)):
    """Key/shape layout of the pvt_v2_b2 checkpoint."""
    sd = {}
    sr_ratios = (8, 4, 2, 1)

    def ln(prefix, c):
        sd[f"{prefix}.weight"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.bias"] = np.random.rand(c).astype(np.float32)

    def lin(prefix, o, i):
        sd[f"{prefix}.weight"] = np.random.rand(o, i).astype(np.float32) * 0.01
        sd[f"{prefix}.bias"] = np.random.rand(o).astype(np.float32) * 0.01

    in_c = 3
    for s in range(4):
        d = embed_dims[s]
        k = 7 if s == 0 else 3
        sd[f"patch_embed{s + 1}.proj.weight"] = (
            np.random.rand(d, in_c, k, k).astype(np.float32) * 0.01
        )
        sd[f"patch_embed{s + 1}.proj.bias"] = np.zeros((d,), np.float32)
        ln(f"patch_embed{s + 1}.norm", d)
        for b in range(depths[s]):
            p = f"block{s + 1}.{b}"
            ln(f"{p}.norm1", d); ln(f"{p}.norm2", d)
            lin(f"{p}.attn.q", d, d)
            lin(f"{p}.attn.kv", 2 * d, d)
            lin(f"{p}.attn.proj", d, d)
            if sr_ratios[s] > 1:
                sd[f"{p}.attn.sr.weight"] = (
                    np.random.rand(d, d, sr_ratios[s], sr_ratios[s]).astype(np.float32) * 0.01
                )
                sd[f"{p}.attn.sr.bias"] = np.zeros((d,), np.float32)
                ln(f"{p}.attn.norm", d)
            hid = d * mlp_ratios[s]
            lin(f"{p}.mlp.fc1", hid, d)
            sd[f"{p}.mlp.dwconv.dwconv.weight"] = (
                np.random.rand(hid, 1, 3, 3).astype(np.float32) * 0.01
            )
            sd[f"{p}.mlp.dwconv.dwconv.bias"] = np.zeros((hid,), np.float32)
            lin(f"{p}.mlp.fc2", d, hid)
        ln(f"norm{s + 1}", d)
        in_c = d
    lin("head", 1000, embed_dims[-1])
    return sd


def test_pvtv2_conversion_structural():
    from pranet2_tpu.models.backbones.pvtv2 import pvt_v2

    sd = synth_pvtv2_sd()
    fvars = convert_state_dict(sd, pvtv2_key_map)
    m = pvt_v2("b2")
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assert tree_shapes(fvars["params"]) == tree_shapes(want["params"])


def test_pranet_v2_full_checkpoint_conversion():
    """Synthesize the full RES-V2.pth key/shape layout and convert it."""
    from pranet2_tpu.models import get_model

    sd = synth_res2net_sd()
    sd = {f"backbone.{k}": v for k, v in sd.items() if not k.startswith("fc.")}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.bias"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = np.random.rand(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.random.rand(c).astype(np.float32) + 0.5

    def conv(prefix, o, i, kh, kw=None, bias=False):
        kw = kh if kw is None else kw
        sd[f"{prefix}.weight"] = np.random.rand(o, i, kh, kw).astype(np.float32) * 0.01
        if bias:
            sd[f"{prefix}.bias"] = np.zeros((o,), np.float32)

    def cbn(prefix, o, i, kh, kw=None):
        conv(f"{prefix}.conv", o, i, kh, kw)
        bn(f"{prefix}.bn", o)

    # grayscale stem
    conv("conv.0", 3, 1, 1, bias=True)
    bn("conv.1", 3)
    # RFBs on 512/1024/2048
    for rfb, in_c in (("rfb2_1", 512), ("rfb3_1", 1024), ("rfb4_1", 2048)):
        cbn(f"{rfb}.branch0.0", 32, in_c, 1)
        for br, k in ((1, 3), (2, 5), (3, 7)):
            cbn(f"{rfb}.branch{br}.0", 32, in_c, 1)
            cbn(f"{rfb}.branch{br}.1", 32, 32, 1, k)
            cbn(f"{rfb}.branch{br}.2", 32, 32, k, 1)
            cbn(f"{rfb}.branch{br}.3", 32, 32, 3)
        cbn(f"{rfb}.conv_cat", 32, 128, 3)
        cbn(f"{rfb}.conv_res", 32, in_c, 1)
    # aggregation
    for cu in (1, 2, 3, 4):
        cbn(f"agg1.conv_upsample{cu}", 32, 32, 3)
    cbn("agg1.conv_upsample5", 64, 64, 3)
    cbn("agg1.conv_concat2", 64, 64, 3)
    cbn("agg1.conv_concat3", 96, 96, 3)
    cbn("agg1.conv4", 96, 96, 3)
    conv("agg1.conv5_fg", 1, 96, 1, bias=True)
    conv("agg1.conv5_bg", 1, 96, 1, bias=True)
    # DSRA branches
    cbn("ra4_conv1", 256, 2048, 1)
    for n in (2, 3, 4):
        cbn(f"ra4_conv{n}", 256, 256, 5)
    cbn("ra4_conv5_fg", 1, 256, 1)
    cbn("ra4_conv5_bg", 1, 256, 1)
    for ra, in_c in ((3, 1024), (2, 512)):
        cbn(f"ra{ra}_conv1", 64, in_c, 1)
        for n in (2, 3):
            cbn(f"ra{ra}_conv{n}", 64, 64, 3)
        cbn(f"ra{ra}_conv4_fg", 1, 64, 3)
        cbn(f"ra{ra}_conv4_bg", 1, 64, 3)

    fvars = convert_state_dict(sd, pranet_key_map("v2", "res2net50"))
    m = get_model("pranet_v2", num_class=1)
    # grayscale init so the stem params exist
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    assert tree_shapes(fvars["params"]) == tree_shapes(want["params"])
    assert tree_shapes(fvars["batch_stats"]) == tree_shapes(want["batch_stats"])
    outs = m.apply(fvars, jnp.zeros((1, 64, 64, 1)))
    assert len(outs) == 8


def test_pranet_v2_head_keymap_covers_model():
    """Every flax param of PraNet-V2 must be produceable by the key map."""
    from pranet2_tpu.models import get_model

    m = get_model("pranet_v2", num_class=1)
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    flax_paths = {
        "/".join(str(k.key) for k in path[:-1])
        for path, _ in jax.tree_util.tree_flatten_with_path(want["params"])[0]
    }
    km = pranet_key_map("v2", "res2net50")
    # torch-side head prefixes from the reference checkpoint layout
    torch_prefixes = []
    for rfb in ("rfb2_1", "rfb3_1", "rfb4_1"):
        torch_prefixes += [f"{rfb}.branch0.0.conv", f"{rfb}.branch0.0.bn"]
        for br in (1, 2, 3):
            for j in range(4):
                torch_prefixes += [f"{rfb}.branch{br}.{j}.conv", f"{rfb}.branch{br}.{j}.bn"]
        torch_prefixes += [f"{rfb}.conv_cat.conv", f"{rfb}.conv_cat.bn",
                           f"{rfb}.conv_res.conv", f"{rfb}.conv_res.bn"]
    for cu in (1, 2, 3, 4, 5):
        torch_prefixes += [f"agg1.conv_upsample{cu}.conv", f"agg1.conv_upsample{cu}.bn"]
    torch_prefixes += ["agg1.conv_concat2.conv", "agg1.conv_concat2.bn",
                       "agg1.conv_concat3.conv", "agg1.conv_concat3.bn",
                       "agg1.conv4.conv", "agg1.conv4.bn",
                       "agg1.conv5_fg", "agg1.conv5_bg"]
    for n in (1, 2, 3, 4):
        torch_prefixes += [f"ra4_conv{n}.conv", f"ra4_conv{n}.bn"]
    torch_prefixes += ["ra4_conv5_fg.conv", "ra4_conv5_fg.bn",
                       "ra4_conv5_bg.conv", "ra4_conv5_bg.bn"]
    for ra in (3, 2):
        for n in (1, 2, 3):
            torch_prefixes += [f"ra{ra}_conv{n}.conv", f"ra{ra}_conv{n}.bn"]
        torch_prefixes += [f"ra{ra}_conv4_fg.conv", f"ra{ra}_conv4_fg.bn",
                           f"ra{ra}_conv4_bg.conv", f"ra{ra}_conv4_bg.bn"]
    torch_prefixes += ["conv.0", "conv.1"]

    mapped = {"/".join(km(p)) for p in torch_prefixes if km(p) is not None}
    head_paths = {p for p in flax_paths if not p.startswith("backbone/")
                  # grayscale stem only exists for 1-channel init; covered by map
                  }
    missing = {p for p in head_paths
               if p not in mapped and not p.startswith(("stem_",))}
    assert not missing, f"unmapped flax paths: {sorted(missing)[:10]}"
