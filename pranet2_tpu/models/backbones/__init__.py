from pranet2_tpu.models.backbones.res2net import Res2Net, res2net50_v1b, res2net101_v1b

__all__ = ["Res2Net", "res2net50_v1b", "res2net101_v1b"]

try:
    from pranet2_tpu.models.backbones.pvtv2 import PVTv2, pvt_v2  # noqa: F401

    __all__ += ["PVTv2", "pvt_v2"]
except ImportError:  # pragma: no cover
    pass
try:
    from pranet2_tpu.models.backbones.resnet import ResNet, resnet  # noqa: F401

    __all__ += ["ResNet", "resnet"]
except ImportError:  # pragma: no cover
    pass
