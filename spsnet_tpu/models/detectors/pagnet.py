"""PAGNet / SPSNet-IA detectors.

``PAGNet`` (parity: ``detectors/PAGNet.py``) is IASSD with the PAGNet
backbone (surface features + stds threading). ``SPSNetIA`` additionally runs
the frozen stability model hook before the backbone — in the reference that
hook is abused as a MAP_TO_BEV slot (``PAGNet_encoding.py``); here it is a
first-class pipeline stage executed by the runtime (see
``spsnet_tpu.stability.hook``), so the detector itself just consumes
``batch['stds']``.
"""
from __future__ import annotations

from .iassd import IASSD


class PAGNet(IASSD):
    """IASSD-shaped detector whose loss also comes from the point head
    (``PAGNet.py:24-31`` routes loss through the dense-head slot; the math is
    the same IASSD head loss)."""


class SPSNetIA(PAGNet):
    """SPSNet-IA: expects ``batch['stds']`` injected by the stability hook."""
