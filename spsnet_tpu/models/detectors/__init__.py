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
from .al_net import ALNet
from .pv_rcnn_plusplus import PVRCNNPlusPlus
from .caddn import CaDDN

_DETECTORS = {
    'IASSD': IASSD,
    # reference ``detectors/3DSSD.py`` is byte-for-byte the IASSD forward
    # (it even keeps the class name ``IASSD``); 3DSSD configs are IA-SSD
    # configs with different SA sampling settings
    '3DSSD': IASSD,
    'ALNet': ALNet,
    'PAGNet': PAGNet,
    'SPSNet': SPSNetIA,
    'PointRCNN': PointRCNN,
    'PointPillar': PointPillar,
    'CenterPoint': CenterPoint,
    'SECONDNet': SECONDNet,
    'PVRCNN': PVRCNN,
    'PVRCNNPlusPlus': PVRCNNPlusPlus,
    'CaDDN': CaDDN,
    'VoxelRCNN': VoxelRCNN,
    'PartA2Net': PartA2Net,
    'SECONDNetIoU': SECONDNetIoU,
}


def build_detector(model_cfg, num_class, dataset=None, **kwargs):
    from ...config import StaticConfig
    model_cfg = StaticConfig(model_cfg)
    cls = _DETECTORS[model_cfg.NAME]
    # the reference's PAGNet detector is a generic module-list runner; its
    # pillar configs (AL.yaml / MLT_SSD.yaml, with a VFE block) build the
    # AL_3D dual-branch stack while point configs build the IA-SSD stack
    if model_cfg.NAME == 'PAGNet' and 'VFE' in model_cfg:
        cls = ALNet
    return cls(model_cfg=model_cfg, num_class=num_class, **kwargs)
