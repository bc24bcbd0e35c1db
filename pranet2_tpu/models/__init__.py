"""Model zoo registry.

Every model family from the reference is constructible from here:
binary (PraNet-V1/V2 x Res2Net/PVTv2) and multiclass (EMCAD, MERIT, MIST).
"""

from pranet2_tpu.models.registry import get_model, list_models, register_model

__all__ = ["get_model", "list_models", "register_model"]

# import for registration side effects
from pranet2_tpu.models import pranet as _pranet  # noqa: E402,F401

try:  # multiclass families are registered as they land
    from pranet2_tpu.models import emcad as _emcad  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from pranet2_tpu.models import merit as _merit  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from pranet2_tpu.models import mist as _mist  # noqa: F401
except ImportError:  # pragma: no cover
    pass
