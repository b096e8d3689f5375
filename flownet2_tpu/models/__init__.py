"""Model zoo: the six FlowNet2 variants + their building-block nets.

``MODELS`` mirrors the reference's select-by-name reflection UX
(/root/reference/main.py:102, utils/tools.py:18-22): any registered model
is constructible by name from the CLI/config layer.
"""

from .flownet_c import FlowNetC  # noqa: F401
from .flownet_s import FlowNetS  # noqa: F401
from .flownet_sd import FlowNetFusion, FlowNetSD  # noqa: F401
from .flownet2 import (  # noqa: F401
    FlowNet2,
    FlowNet2C,
    FlowNet2CS,
    FlowNet2CSS,
    FlowNet2S,
    FlowNet2SD,
    normalize_pair,
)

MODELS = {
    "FlowNet2": FlowNet2,
    "FlowNet2C": FlowNet2C,
    "FlowNet2S": FlowNet2S,
    "FlowNet2SD": FlowNet2SD,
    "FlowNet2CS": FlowNet2CS,
    "FlowNet2CSS": FlowNet2CSS,
}


def get_model(name: str, **kwargs):
    """Construct a registered model by name (KeyError lists choices)."""
    try:
        cls = MODELS[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODELS)}") from None
    return cls(**kwargs)
