"""Import shims for running the reference torch models as parity oracles.

The reference code (/root/reference — treated as untrusted spec, imported
only to *execute* as a numeric oracle, never copied) needs three things this
image lacks:

* ``timm`` — the reference uses a handful of trivial utilities
  (``DropPath``, ``to_2tuple``, ``trunc_normal_``/``trunc_normal_tf_``,
  ``named_apply``, ``register_model``, ``_cfg``, ImageNet mean/std).  We
  install a minimal stand-in implementing exactly those.
* ``torchvision`` — only ``torchvision.utils.save_image`` is imported
  (never called in forward); stubbed.
* Hard-coded ``torch.load('…pth')`` calls inside model constructors
  (e.g. /root/reference/binary_seg/lib/Res2Net_v1b.py:198) — neutralized by
  patching ``torch.load`` to return ``{}`` and making ``load_state_dict``
  non-strict, so constructors build random-init models.

Each reference sub-repo ships its own top-level package named ``lib``; use
:func:`load_ref_module` to swap sys.path and purge module caches between
families.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types

import numpy as np
import torch

REF = "/root/reference"


# ---------------------------------------------------------------------------
# minimal timm / torchvision stand-ins
# ---------------------------------------------------------------------------


def _to_2tuple(x):
    return x if isinstance(x, (tuple, list)) else (x, x)


class _DropPath(torch.nn.Module):
    """Per-sample stochastic depth (identity at rate 0 / eval)."""

    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = float(drop_prob)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if keep > 0.0 and self.scale_by_keep:
            mask.div_(keep)
        return x * mask


def _trunc_normal_tf_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        torch.nn.init.trunc_normal_(tensor, 0.0, 1.0, a, b)
        tensor.mul_(std).add_(mean)
    return tensor


def _named_apply(fn, module, name="", depth_first=True, include_root=False):
    if not depth_first and include_root:
        fn(module=module, name=name)
    for child_name, child in module.named_children():
        child_full = f"{name}.{child_name}" if name else child_name
        _named_apply(fn, child, name=child_full, depth_first=depth_first,
                     include_root=True)
    if depth_first and include_root:
        fn(module=module, name=name)
    return module


def install_shims() -> None:
    """Install fake ``timm`` / ``torchvision`` modules (idempotent)."""
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm.__path__ = []
        timm.__version__ = "0.6.12"  # what the vendored models_timm fork expects

        data = types.ModuleType("timm.data")
        data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
        data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
        data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)

        models = types.ModuleType("timm.models")
        models.__path__ = []

        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = _DropPath
        layers.to_2tuple = _to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        layers.trunc_normal_tf_ = _trunc_normal_tf_

        registry = types.ModuleType("timm.models.registry")
        registry.register_model = lambda fn: fn

        vit = types.ModuleType("timm.models.vision_transformer")
        vit._cfg = lambda url="", **kw: {"url": url, **kw}

        helpers = types.ModuleType("timm.models.helpers")
        helpers.named_apply = _named_apply

        models.layers = layers
        models.registry = registry
        models.vision_transformer = vit
        models.helpers = helpers
        timm.data = data
        timm.models = models
        sys.modules.update({
            "timm": timm,
            "timm.data": data,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.registry": registry,
            "timm.models.vision_transformer": vit,
            "timm.models.helpers": helpers,
        })

    # extra stand-ins for the reference's volumetric-eval utils
    # (multiclass_seg/*/utils/utils.py imports; none are exercised on the
    # code paths the oracle tests run, except medpy which is only the metric
    # *readout* — shimmed with pranet2_tpu.evalx.volumetric, which is
    # property-tested against an independent medpy-0.5.2 transcription in
    # tests/test_volumetric_medpy.py, so the pipeline comparison it reads
    # out is not circular).
    def _empty(name, **attrs):
        if name in sys.modules:
            return
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m

    try:
        import medpy  # noqa: F401
    except ImportError:
        from pranet2_tpu.evalx import volumetric as _vol

        medpy = types.ModuleType("medpy")
        medpy.__path__ = []
        metric_mod = types.ModuleType("medpy.metric")
        binary_mod = types.ModuleType("medpy.metric.binary")
        binary_mod.dc = lambda r, g: _vol.dice_coefficient(
            np.atleast_1d(np.asarray(r)).astype(bool),
            np.atleast_1d(np.asarray(g)).astype(bool))
        binary_mod.jc = lambda r, g: _vol.jaccard(
            np.atleast_1d(np.asarray(r)).astype(bool),
            np.atleast_1d(np.asarray(g)).astype(bool))
        binary_mod.hd95 = lambda r, g, **k: _vol.hd95(
            np.asarray(r) > 0, np.asarray(g) > 0)
        binary_mod.assd = lambda r, g, **k: _vol.assd(
            np.asarray(r) > 0, np.asarray(g) > 0)
        metric_mod.binary = binary_mod
        medpy.metric = metric_mod
        sys.modules.update({"medpy": medpy, "medpy.metric": metric_mod,
                            "medpy.metric.binary": binary_mod})
    _empty("seaborn")
    _empty("segmentation_mask_overlay",
           overlay_masks=lambda *a, **k: (_ for _ in ()).throw(
               RuntimeError("overlay stub")))
    _empty("SimpleITK")
    _empty("thop", profile=lambda *a, **k: (0, 0),
           clever_format=lambda *a, **k: ("0", "0"))
    _empty("ptflops", get_model_complexity_info=lambda *a, **k: (0, 0))

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        utils = types.ModuleType("torchvision.utils")
        utils.save_image = lambda *a, **k: None
        tv.utils = utils
        models = types.ModuleType("torchvision.models")

        def _no_download(*a, **k):  # CRANet.initialize_weights is patched out
            raise RuntimeError("torchvision.models stub: no downloads here")

        models.resnet50 = _no_download
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = utils
        sys.modules["torchvision.models"] = models


@contextlib.contextmanager
def neutralized_loading():
    """Make hard-coded checkpoint loads inside reference ctors no-ops."""
    orig_load = torch.load
    orig_lsd = torch.nn.Module.load_state_dict

    def fake_load(*a, **k):
        return {}

    def tolerant_lsd(self, state_dict, strict=True, **kw):
        return orig_lsd(self, state_dict, strict=False, **kw)

    torch.load = fake_load
    torch.nn.Module.load_state_dict = tolerant_lsd
    try:
        yield
    finally:
        torch.load = orig_load
        torch.nn.Module.load_state_dict = orig_lsd


# Python 3.12 rejects dataclass field defaults that are unhashable instances
# (pre-3.11 only list/dict/set were rejected), which breaks the reference's
# vendored maxxvit_4out.py at import.  We exec a minimally source-patched copy
# (two field lines -> default_factory) instead of editing the read-only tree.
_PY312_FIXES = {
    "lib.maxxvit_4out": (
        "lib/maxxvit_4out.py",
        [
            ("from dataclasses import dataclass, replace",
             "from dataclasses import dataclass, replace, field"),
            ("    conv_cfg: MaxxVitConvCfg = MaxxVitConvCfg()",
             "    conv_cfg: MaxxVitConvCfg = field(default_factory=MaxxVitConvCfg)"),
            ("    transformer_cfg: MaxxVitTransformerCfg = MaxxVitTransformerCfg()",
             "    transformer_cfg: MaxxVitTransformerCfg ="
             " field(default_factory=MaxxVitTransformerCfg)"),
        ],
    ),
}


def _exec_patched(root: str, fullname: str, relpath: str, fixes) -> None:
    with open(f"{root}/{relpath}") as f:
        src = f.read()
    for old, new in fixes:
        assert old in src, f"py312 fix pattern not found in {relpath}: {old!r}"
        src = src.replace(old, new)
    mod = types.ModuleType(fullname)
    mod.__file__ = f"{root}/{relpath}"
    pkg, _, _ = fullname.rpartition(".")
    mod.__package__ = pkg
    sys.modules[fullname] = mod
    try:
        exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    except BaseException:
        del sys.modules[fullname]
        raise
    if pkg and pkg in sys.modules:
        setattr(sys.modules[pkg], fullname.rpartition(".")[2], mod)


def load_ref_module(subrepo: str, modname: str):
    """Import ``modname`` (e.g. 'lib.pranet') from a reference sub-repo.

    Purges any previously imported ``lib`` package first — every reference
    sub-repo has its own top-level package called ``lib``.
    """
    install_shims()
    root = f"{REF}/{subrepo}"
    # every reference sub-repo has top-level packages named 'lib' and
    # 'utils' — purge both so imports bind to the requested sub-repo
    for key in [k for k in sys.modules
                if k in ("lib", "utils")
                or k.startswith(("lib.", "utils."))]:
        del sys.modules[key]
    sys.path.insert(0, root)
    try:
        with neutralized_loading():
            for fullname, (relpath, fixes) in _PY312_FIXES.items():
                if os.path.exists(f"{root}/{relpath}"):
                    importlib.import_module(fullname.rpartition(".")[0])
                    _exec_patched(root, fullname, relpath, fixes)
            return importlib.import_module(modname)
    finally:
        sys.path.remove(root)


def to_numpy_sd(module: torch.nn.Module) -> dict:
    # .copy() matters: .numpy() aliases the torch storage, and jnp.asarray on
    # the CPU backend can be zero-copy too — torch in-place mutation (opt.step,
    # train-mode BN running-stat updates) would silently change the JAX arrays.
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


def nchw_to_nhwc(t: torch.Tensor):
    import numpy as np

    return np.moveaxis(t.detach().cpu().numpy(), 1, -1)
