"""Model zoo: registries mirror the reference's per-package ``__init__`` maps
(``pcdet/models/detectors/__init__.py:15-29`` etc.), but modules are flax
``nn.Module``s composed into one jitted program.
"""
from .detectors import build_detector  # noqa: F401
