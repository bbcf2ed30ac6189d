"""Import the reference torch MVTracker on CPU with optional deps stubbed.

Used by architecture-parity tests: the reference repo pulls heavy optional
dependencies (torchvision, kornia, rerun, pypng, ...) through its package
__init__ chain; none affect the model's forward math on CPU.
"""

import sys
import types
import warnings

REF = "/root/reference"


def reference_available() -> bool:
    """True when the reference repo snapshot is present (not on CI runners)."""
    import os

    return os.path.isdir(REF)


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Dummy:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise RuntimeError("stubbed")


def load_reference_mvtracker():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    warnings.filterwarnings("ignore")

    _stub("png", Reader=_Dummy, Writer=_Dummy)
    _stub("rerun")
    kg = _stub("kornia.geometry", quaternion_to_rotation_matrix=_Dummy())
    k = _stub("kornia", geometry=kg)
    tvf = _stub("torchvision.transforms.functional", gaussian_blur=_Dummy())
    tvt = _stub(
        "torchvision.transforms",
        functional=tvf,
        ColorJitter=_Dummy,
        GaussianBlur=_Dummy,
    )
    _stub("torchvision", transforms=tvt)
    _stub("mediapy", read_video=_Dummy(), write_video=_Dummy())
    _stub("easydict", EasyDict=dict)
    _stub("gpustat", new_query=_Dummy())

    from mvtracker.models.core.mvtracker.mvtracker import MVTracker as TorchMVTracker

    return TorchMVTracker
