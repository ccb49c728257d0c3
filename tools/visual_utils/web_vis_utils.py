"""Parity shim for the reference's ``tools/visual_utils`` package.

The reference opens open3d/mayavi GUI windows (``open3d_vis_utils.py``,
``visualize_utils.py``); TPU hosts are headless, so ``draw_scenes`` here
writes a self-contained interactive HTML viewer instead (orbit/zoom/pan,
GT + prediction boxes). Implementation: ``spsnet_tpu.utils.web_vis``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from spsnet_tpu.utils.web_vis import draw_scenes  # noqa: F401,E402
