"""torch ``.pth`` state_dict -> flax variables converter.

The reference ships all checkpoints as torch state_dicts (backbone ImageNet
weights and trained models — e.g. loading at ``binary_seg/lib/pranet.py:148-152``,
``binary_seg/MyTest_med.py:56-77``).  This module converts them to this
framework's pytree layout so predictions are interchangeable (the Jittor-port
strategy, ``SURVEY.md`` §2.8, applied to JAX).

Design: a per-model *key map* turns a torch dotted key prefix (module path,
without the trailing ``weight``/``bias``/``running_*``) into a flax path
tuple.  Tensor layout conversion is inferred from the parameter kind:

* conv weight  OIHW -> HWIO  (works for depthwise too: (C,1,kh,kw)->(kh,kw,1,C))
* linear weight (out,in) -> (in,out)
* norm weight/bias -> scale/bias; running stats -> ``batch_stats``

Whether a prefix is BatchNorm (vs LayerNorm) is detected by the presence of a
``running_mean`` companion key in the state_dict.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import jax.numpy as jnp
import numpy as np

KeyMap = Callable[[str], tuple[str, ...] | None]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` into numpy (torch only needed here, on host)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def convert_state_dict(
    sd: dict[str, np.ndarray],
    key_map: KeyMap,
    strict: bool = True,
) -> dict:
    """Convert a torch state_dict into ``{'params': ..., 'batch_stats': ...}``."""
    params: dict = {}
    stats: dict = {}
    skipped: list[str] = []

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    prefixes = {k.rsplit(".", 1)[0] for k in sd if "." in k}
    for prefix in sorted(prefixes):
        flax_path = key_map(prefix)
        if flax_path is None:
            skipped.append(prefix)
            continue
        is_bn = f"{prefix}.running_mean" in sd
        w = sd.get(f"{prefix}.weight")
        b = sd.get(f"{prefix}.bias")
        if is_bn:
            put(params, flax_path + ("scale",), w)
            if b is not None:
                put(params, flax_path + ("bias",), b)
            put(stats, flax_path + ("mean",), sd[f"{prefix}.running_mean"])
            put(stats, flax_path + ("var",), sd[f"{prefix}.running_var"])
        elif w is not None and w.ndim == 4:  # conv
            put(params, flax_path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
            if b is not None:
                put(params, flax_path + ("bias",), b)
        elif w is not None and w.ndim == 2:  # linear
            put(params, flax_path + ("kernel",), np.transpose(w, (1, 0)))
            if b is not None:
                put(params, flax_path + ("bias",), b)
        elif w is not None and w.ndim == 1:  # layernorm
            put(params, flax_path + ("scale",), w)
            if b is not None:
                put(params, flax_path + ("bias",), b)
        else:
            skipped.append(prefix)

    if strict and skipped:
        unexpected = [p for p in skipped if not _is_ignorable(p)]
        if unexpected:
            raise ValueError(f"unmapped torch prefixes: {unexpected[:10]}")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _is_ignorable(prefix: str) -> bool:
    # classifier heads / thop counters the feature models never use
    return bool(re.search(r"(^|\.)(fc|head)$|num_batches_tracked|total_ops|total_params", prefix))


# ---------------------------------------------------------------------------
# Key maps
# ---------------------------------------------------------------------------


def res2net_key_map(prefix: str) -> tuple[str, ...] | None:
    """torch Res2Net-v1b names -> flax ``Res2Net`` paths."""
    if prefix in ("fc", "avgpool"):
        return None
    m = re.fullmatch(r"conv1\.(\d)", prefix)
    if m:
        return (f"conv1_{m.group(1)}",)
    if prefix == "bn1":
        return ("bn1",)
    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", prefix)
    if m:
        l, b, rest = m.groups()
        block = f"layer{l}_{b}"
        mm = re.fullmatch(r"(convs|bns)\.(\d)", rest)
        if mm:
            return (block, f"{mm.group(1)}_{mm.group(2)}")
        mm = re.fullmatch(r"downsample\.(\d)", rest)
        if mm:
            return (block, f"downsample_{mm.group(1)}")
        if rest in ("conv1", "bn1", "conv3", "bn3"):
            return (block, rest)
    return None


def pvtv2_key_map(prefix: str) -> tuple[str, ...] | None:
    """torch PVTv2 names -> flax ``PVTv2`` paths."""
    if prefix == "head":
        return None
    m = re.fullmatch(r"patch_embed(\d)\.(proj|norm)", prefix)
    if m:
        return (f"patch_embed{m.group(1)}_{m.group(2)}",)
    m = re.fullmatch(r"norm(\d)", prefix)
    if m:
        return (f"norm{m.group(1)}",)
    m = re.fullmatch(r"block(\d)\.(\d+)\.(.+)", prefix)
    if m:
        s, b, rest = m.groups()
        block = f"block{s}_{b}"
        table = {
            "norm1": ("norm1",),
            "norm2": ("norm2",),
            "attn.q": ("attn", "q"),
            "attn.kv": ("attn", "kv"),
            "attn.proj": ("attn", "proj"),
            "attn.sr": ("attn", "sr"),
            "attn.norm": ("attn", "norm"),
            "mlp.fc1": ("mlp", "fc1"),
            "mlp.fc2": ("mlp", "fc2"),
            "mlp.dwconv.dwconv": ("mlp", "dwconv"),
        }
        if rest in table:
            return (block,) + table[rest]
    return None


def resnet_key_map(prefix: str) -> tuple[str, ...] | None:
    """torchvision-style ResNet names -> flax ``ResNet`` paths."""
    if prefix in ("fc", "avgpool"):
        return None
    if prefix in ("conv1", "bn1"):
        return (prefix,)
    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", prefix)
    if m:
        l, b, rest = m.groups()
        block = f"layer{l}_{b}"
        mm = re.fullmatch(r"downsample\.(\d)", rest)
        if mm:
            return (block, f"downsample_{mm.group(1)}")
        if re.fullmatch(r"(conv|bn)[123]", rest):
            return (block, rest)
    return None


def emcad_key_map(encoder: str = "pvt_v2_b2") -> KeyMap:
    """Key map for full EMCADNet checkpoints (e.g. EMCAD_Synapse.pth).

    Torch layout: 'backbone.*' encoder, 'decoder.*' EMCAD(_dual) decoder,
    'out_head{1..4}' single-supervision heads, 'conv.{0,1}' grayscale stem.
    """
    bb_inner = pvtv2_key_map if encoder.startswith("pvt_v2") else resnet_key_map
    bb = _with_prefix(bb_inner, "backbone", "backbone")

    def decoder(rest: str) -> tuple[str, ...] | None:
        # mscb{i} is an nn.Sequential of MSCB blocks: 'mscbN.0.<...>'
        m = re.fullmatch(r"mscb(\d)\.0\.(.+)", rest)
        if m:
            i, sub = m.groups()
            name = f"mscb{i}"
            mm = re.fullmatch(r"pconv([12])\.0", sub)
            if mm:
                return (name, f"pconv{mm.group(1)}")
            mm = re.fullmatch(r"pconv([12])\.1", sub)
            if mm:
                return (name, f"pconv{mm.group(1)}_bn")
            mm = re.fullmatch(r"msdc\.dwconvs\.(\d)\.0", sub)
            if mm:
                return (name, f"dwconv{mm.group(1)}")
            mm = re.fullmatch(r"msdc\.dwconvs\.(\d)\.1", sub)
            if mm:
                return (name, f"dwconv{mm.group(1)}_bn")
            if sub == "conv1x1":
                return (name, "conv1x1")
            return None
        m = re.fullmatch(r"eucb(\d)\.up_dwc\.1", rest)
        if m:
            return (f"eucb{m.group(1)}", "up_dwc")
        m = re.fullmatch(r"eucb(\d)\.up_dwc\.2", rest)
        if m:
            return (f"eucb{m.group(1)}", "up_dwc_bn")
        m = re.fullmatch(r"eucb(\d)\.pwc\.0", rest)
        if m:
            return (f"eucb{m.group(1)}", "pwc")
        m = re.fullmatch(r"lgag(\d)\.(W_g|W_x)\.0", rest)
        if m:
            return (f"lgag{m.group(1)}", m.group(2))
        m = re.fullmatch(r"lgag(\d)\.(W_g|W_x)\.1", rest)
        if m:
            return (f"lgag{m.group(1)}", f"{m.group(2)}_bn")
        m = re.fullmatch(r"lgag(\d)\.psi\.0", rest)
        if m:
            return (f"lgag{m.group(1)}", "psi")
        m = re.fullmatch(r"lgag(\d)\.psi\.1", rest)
        if m:
            return (f"lgag{m.group(1)}", "psi_bn")
        m = re.fullmatch(r"cab(\d)\.(fc[12])", rest)
        if m:
            return (f"cab{m.group(1)}", m.group(2))
        if rest == "sab.conv":
            return ("sab", "conv")
        m = re.fullmatch(r"(ConvBlock\d_(?:fg|bg))\.(conv|bn)", rest)
        if m:
            return (m.group(1), m.group(2))
        return None

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        if prefix == "conv.0":
            return ("stem_conv",)
        if prefix == "conv.1":
            return ("stem_bn",)
        m = re.fullmatch(r"out_head(\d)", prefix)
        if m:
            return (f"out_head{m.group(1)}",)
        if prefix.startswith("decoder."):
            return _prepend(decoder(prefix[len("decoder."):]), "decoder")
        return None

    return f


def _prepend(path, name):
    return None if path is None else (name,) + path


def _with_prefix(inner: KeyMap, torch_prefix: str, flax_prefix: str) -> KeyMap:
    def f(prefix: str):
        if not prefix.startswith(torch_prefix + "."):
            return None
        sub = inner(prefix[len(torch_prefix) + 1:])
        return None if sub is None else (flax_prefix,) + sub

    return f


def pranet_key_map(version: str, backbone: str) -> KeyMap:
    """Key map for full PraNet models (binary_seg checkpoints).

    version: 'v1' | 'v2';  backbone: 'res2net50' | 'pvt_v2_b2'.
    Torch top-level names: 'resnet' (V1-res2net) or 'backbone' (others).
    """
    bb_torch = "resnet" if (version == "v1" and backbone == "res2net50") else "backbone"
    bb_map = res2net_key_map if backbone == "res2net50" else pvtv2_key_map
    bb = _with_prefix(bb_map, bb_torch, "backbone")

    def head(prefix: str) -> tuple[str, ...] | None:
        # grayscale stem (V2): conv.0 / conv.1
        if prefix == "conv.0":
            return ("stem_conv",)
        if prefix == "conv.1":
            return ("stem_bn",)
        # RFBs: rfbX_1.branchK.J.{conv,bn} / conv_cat / conv_res
        m = re.fullmatch(r"(rfb[234]_1)\.branch(\d)\.(\d)\.(conv|bn)", prefix)
        if m:
            return (m.group(1), f"branch{m.group(2)}_{m.group(3)}", m.group(4))
        m = re.fullmatch(r"(rfb[234]_1)\.(conv_cat|conv_res)\.(conv|bn)", prefix)
        if m:
            return (m.group(1), m.group(2), m.group(3))
        # aggregation
        m = re.fullmatch(
            r"agg1\.(conv_upsample\d|conv_concat[23]|conv4)\.(conv|bn)", prefix
        )
        if m:
            return ("agg1", m.group(1), m.group(2))
        m = re.fullmatch(r"agg1\.(conv5(?:_fg|_bg)?)", prefix)
        if m:
            return ("agg1", m.group(1))
        # RA/DSRA branches: ra{4,3,2}_convN[_fg|_bg].{conv,bn}
        m = re.fullmatch(r"ra([234])_(conv\d(?:_fg|_bg)?)\.(conv|bn)", prefix)
        if m:
            return (f"ra{m.group(1)}", m.group(2), m.group(3))
        return None

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        return head(prefix)

    return f
