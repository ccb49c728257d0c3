"""Detector registry (parity: ``pcdet/models/detectors/__init__.py:15-37``)."""
from .iassd import IASSD
from .pagnet import PAGNet, SPSNetIA
from .point_rcnn import PointRCNN
from .pointpillar import PointPillar
from .centerpoint import CenterPoint
from .second_net import SECONDNet
from .pv_rcnn import PVRCNN
from .voxel_rcnn import VoxelRCNN
from .part_a2 import PartA2Net
from .second_net_iou import SECONDNetIoU

_DETECTORS = {
    'IASSD': IASSD,
    'PAGNet': PAGNet,
    'SPSNet': SPSNetIA,
    'PointRCNN': PointRCNN,
    'PointPillar': PointPillar,
    'CenterPoint': CenterPoint,
    'SECONDNet': SECONDNet,
    'PVRCNN': PVRCNN,
    'VoxelRCNN': VoxelRCNN,
    'PartA2Net': PartA2Net,
    'SECONDNetIoU': SECONDNetIoU,
}


def build_detector(model_cfg, num_class, dataset=None, **kwargs):
    from ...config import StaticConfig
    model_cfg = StaticConfig(model_cfg)
    cls = _DETECTORS[model_cfg.NAME]
    return cls(model_cfg=model_cfg, num_class=num_class, **kwargs)
