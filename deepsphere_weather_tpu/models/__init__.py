"""Model architectures, selected by `architecture_name` (reference:
modules/utils_config.py:349-372 reflection-based instantiation)."""

from typing import Dict

from .unet import UNetSpherical  # noqa: F401
from .variants import (  # noqa: F401
    ConvNetSpherical,
    DownscalingNetSpherical,
    EPDNetSpherical,
    ResNetSpherical,
)
from .geometry import ModelGeometry, build_model_geometry  # noqa: F401

ARCHITECTURES: Dict[str, type] = {
    "UNetSpherical": UNetSpherical,
    "ResNetSpherical": ResNetSpherical,
    "EPDNetSpherical": EPDNetSpherical,
    "ConvNetSpherical": ConvNetSpherical,
    "DownscalingNetSpherical": DownscalingNetSpherical,
}


def get_model(architecture_name: str, tensor_info: Dict, **model_kwargs):
    """Instantiate an architecture by name, filtering unknown kwargs
    (mirrors reference get_pytorch_model, modules/utils_config.py:349-372)."""
    import inspect

    if architecture_name not in ARCHITECTURES:
        raise ValueError(
            f"unknown architecture {architecture_name!r}; "
            f"available: {sorted(ARCHITECTURES)}")
    cls = ARCHITECTURES[architecture_name]
    sig = inspect.signature(cls.__init__)
    has_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                     for p in sig.parameters.values())
    if has_var_kw:
        # classes with **kwargs see every setting (they ignore what they
        # don't use); filtering by named params would silently drop e.g.
        # `knn` for the variant architectures
        accepted = dict(model_kwargs)
    else:
        accepted = {k: v for k, v in model_kwargs.items()
                    if k in sig.parameters}
    return cls(tensor_info=tensor_info, **accepted)
