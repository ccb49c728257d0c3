"""Detector registry (parity: ``pcdet/models/detectors/__init__.py:15-37``)."""
from .iassd import IASSD
from .pagnet import PAGNet, SPSNetIA
from .point_rcnn import PointRCNN
from .pointpillar import PointPillar
from .centerpoint import CenterPoint
from .second_net import SECONDNet
from .pv_rcnn import PVRCNN
from .voxel_rcnn import VoxelRCNN
from .part_a2 import PartA2FreeNet, PartA2Net
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
    # nuScenes AL.yaml drives the dual-branch stack as NAME: CenterPoint
    # with BACKBONE_3D: AL_3D
    if model_cfg.NAME == 'CenterPoint' and \
            model_cfg.get('BACKBONE_3D', None) is not None and \
            model_cfg.BACKBONE_3D.get('NAME', '') == 'AL_3D':
        cls = ALNet
    # PartA2_free.yaml drives the reference's generic PointRCNN two-stage
    # runner over a UNetV2 voxel backbone + box-predicting intra-part head
    if model_cfg.NAME == 'PointRCNN' and \
            model_cfg.BACKBONE_3D.get('NAME', '') == 'UNetV2':
        cls = PartA2FreeNet
    # detectors are flax dataclasses with family-specific fields (voxel_size,
    # final_grid_zyx, class_names, ...); drop kwargs a family doesn't take so
    # one config-derived kwargs dict serves the whole zoo
    fields = getattr(cls, '__dataclass_fields__', {})
    kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return cls(model_cfg=model_cfg, num_class=num_class, **kwargs)


def build_detector_from_cfg(cfg, **extra):
    """Build from a FULL experiment config: derives the detector's geometry
    kwargs (point-cloud range, voxel size, sparse-plan final grid, point
    feature count) from DATA_CONFIG — the reference threads the same facts
    through ``model_info_dict`` (``detector3d_template.py:40-55``)."""
    import numpy as np

    kwargs = dict(extra)
    data_cfg = cfg.get('DATA_CONFIG', None)
    if data_cfg is not None:
        pcr = data_cfg.get('POINT_CLOUD_RANGE', None)
        if pcr is not None:
            kwargs.setdefault('point_cloud_range',
                              tuple(float(v) for v in pcr))
        for p in data_cfg.get('DATA_PROCESSOR', []) or []:
            # incl. transform_points_to_voxels_placeholder — the dynamic
            # voxelization configs carry VOXEL_SIZE there (the reference
            # reads it the same way, ``data_processor.py`` placeholder)
            if p['NAME'].startswith('transform_points_to_voxels') \
                    and 'VOXEL_SIZE' in p:
                kwargs.setdefault('voxel_size',
                                  tuple(float(v) for v in p['VOXEL_SIZE']))
        pfe = data_cfg.get('POINT_FEATURE_ENCODING', None)
        if pfe is not None:
            kwargs.setdefault('num_point_features',
                              len(pfe['used_feature_list']))
        if 'voxel_size' in kwargs and pcr is not None:
            from ...data.processor.sparse_plan import plan_final_grid
            span = np.asarray(pcr[3:6]) - np.asarray(pcr[0:3])
            grid_xyz = np.round(
                span / np.asarray(kwargs['voxel_size'])).astype(np.int64)
            # the reference pads the sparse z-shape by one empty slice
            # (``spconv_backbone.py:76 sparse_shape = grid[::-1]+[1,0,0]``);
            # KITTI z=40 -> 41 -> final nz=2, matching NUM_BEV_FEATURES 256
            grid_zyx = grid_xyz[::-1].copy()
            grid_zyx[0] += 1
            kwargs.setdefault('final_grid_zyx', plan_final_grid(grid_zyx))
    kwargs.setdefault('class_names', list(cfg.CLASS_NAMES))
    return build_detector(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          **kwargs)
