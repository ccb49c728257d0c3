"""Programmatic model configs (mirrors ``tools/cfgs`` YAMLs) for tests,
benchmarks, and the driver entry points."""
from __future__ import annotations

from pathlib import Path

from .config import EDict, cfg_from_yaml_file

_REPO = Path(__file__).resolve().parent.parent


def load_yaml_cfg(rel_path: str) -> EDict:
    cfg = EDict()
    cfg_from_yaml_file(_REPO / rel_path, cfg)
    return cfg


def iassd_kitti_cfg() -> EDict:
    """The flagship full-size IA-SSD KITTI config."""
    return load_yaml_cfg('tools/cfgs/kitti_models/IA-SSD.yaml')


def scale_sa_config(model_cfg: EDict, factor: int) -> EDict:
    """Shrink NPOINT_LIST by ``factor`` (for tiny smoke shapes)."""
    sa = model_cfg.BACKBONE_3D.SA_CONFIG
    sa.NPOINT_LIST = [[max(p // factor, 4) if p > 0 else p for p in layer]
                      for layer in sa.NPOINT_LIST]
    return model_cfg


def tiny_iassd_cfg() -> EDict:
    """Tiny IA-SSD (CPU-fast) with the same topology as the flagship."""
    cfg = EDict({
        'NAME': 'IASSD',
        'BACKBONE_3D': {
            'NAME': 'IASSD_Backbone',
            'SA_CONFIG': {
                'NPOINT_LIST': [[128], [64], [32], [16], [-1], [16]],
                'SAMPLE_RANGE_LIST': [[-1]] * 6,
                'SAMPLE_METHOD_LIST': [['D-FPS'], ['D-FPS'], ['ctr_aware'],
                                       ['ctr_aware'], [], []],
                'RADIUS_LIST': [[0.2, 0.8], [0.8, 1.6], [1.6, 4.8], [], [],
                                [4.8, 6.4]],
                'NSAMPLE_LIST': [[4, 8], [4, 8], [4, 8], [], [], [4, 8]],
                'MLPS': [[[8, 8, 16], [8, 8, 16]],
                         [[16, 16, 32], [16, 16, 32]],
                         [[32, 32, 32], [32, 32, 32]],
                         [],
                         [32],
                         [[32, 32, 64], [32, 32, 64]]],
                'LAYER_TYPE': ['SA_Layer', 'SA_Layer', 'SA_Layer', 'SA_Layer',
                               'Vote_Layer', 'SA_Layer'],
                'DILATED_GROUP': [False] * 6,
                'AGGREGATION_MLPS': [[16], [32], [64], [64], [], [64]],
                'CONFIDENCE_MLPS': [[], [16], [32], [], [], []],
                'LAYER_INPUT': [0, 1, 2, 3, 4, 3],
                'CTR_INDEX': [-1, -1, -1, -1, -1, 5],
                'MAX_TRANSLATE_RANGE': [3.0, 3.0, 2.0],
            },
        },
        'POINT_HEAD': {
            'NAME': 'IASSD_Head',
            'CLS_FC': [32], 'REG_FC': [32],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'INS_AWARE_ASSIGN': True,
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'ASSIGN_METHOD': {
                    'NAME': 'extend_gt', 'ASSIGN_TYPE': 'centers_origin',
                    'EXTRA_WIDTH': [1.0, 1.0, 1.0], 'FG_PC_IGNORE': False,
                },
                'BOX_CODER': 'PointResidual_BinOri_Coder',
                'BOX_CODER_CONFIG': {
                    'angle_bin_num': 12,
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]],
                },
            },
            'LOSS_CONFIG': {
                'LOSS_CLS': 'WeightedCrossEntropy',
                'LOSS_REG': 'WeightedSmoothL1Loss',
                'LOSS_INS': 'WeightedCrossEntropy',
                'SAMPLE_METHOD_LIST': [['D-FPS'], ['D-FPS'], ['ctr_aware'],
                                       ['ctr_aware'], [], []],
                'LOSS_VOTE_TYPE': 'none',
                'CORNER_LOSS_REGULARIZATION': True,
                'CENTERNESS_REGULARIZATION': True,
                'CENTERNESS_REGULARIZATION_SA': True,
                'LOSS_WEIGHTS': {
                    'ins_aware_weight': [0, 1.0, 1.0],
                    'vote_weight': 1.0, 'point_cls_weight': 1.0,
                    'point_box_weight': 1.0, 'corner_weight': 1.0,
                    'code_weights': [1.0] * 6, 'dir_weight': 0.2,
                },
            },
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7],
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {
                'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 64,
                'NMS_POST_MAXSIZE': 16,
            },
        },
    })
    return cfg


def tiny_spsnet_cfg() -> EDict:
    """Tiny SPSNet-IA: PAGNet backbone (surface features + stds threading),
    sss_aware samplers, MLT head."""
    cfg = tiny_iassd_cfg()
    cfg.NAME = 'SPSNet'
    sa = cfg.BACKBONE_3D.SA_CONFIG
    cfg.BACKBONE_3D.NAME = 'PAGNet_Backbone'
    sa.SAMPLE_METHOD_LIST = [['D-FPS'], ['D-FPS'], ['sss_aware'],
                             ['sss_aware'], [], []]
    sa.SS_RADIUS_LIST = [[0.05], [0.2], [0.4], [0.8], [], []]
    sa.SS_NSAMPLE_LIST = [[4], [4], [4], [4], [], []]
    sa.USE_SURFACE = True
    cfg.POINT_HEAD.NAME = 'MLT_SSD_Head'
    cfg.POINT_HEAD.LOSS_CONFIG.SAMPLE_METHOD_LIST = sa.SAMPLE_METHOD_LIST
    return cfg


def tiny_pointrcnn_cfg() -> EDict:
    """Tiny PointRCNN (CPU-fast) with the flagship two-stage topology."""
    return EDict({
        'NAME': 'PointRCNN',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [64, 32, 16, 8],
                'RADIUS': [[0.1, 0.5], [0.5, 1.0], [1.0, 2.0], [2.0, 4.0]],
                'NSAMPLE': [[4, 8], [4, 8], [4, 8], [4, 8]],
                'MLPS': [[[8, 8, 16], [8, 8, 16]],
                         [[16, 16, 32], [16, 16, 32]],
                         [[32, 32, 64], [32, 32, 64]],
                         [[64, 64, 128], [64, 64, 128]]],
            },
            'FP_MLPS': [[32, 32], [32, 32], [64, 64], [64, 64]],
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadBox',
            'CLS_FC': [32], 'REG_FC': [32],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'BOX_CODER': 'PointResidualCoder',
                'BOX_CODER_CONFIG': {
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                  [1.76, 0.6, 1.73]],
                },
            },
            'LOSS_CONFIG': {
                'LOSS_REG': 'WeightedSmoothL1Loss',
                'LOSS_WEIGHTS': {
                    'point_cls_weight': 1.0, 'point_box_weight': 1.0,
                    'code_weights': [1.0] * 8,
                },
            },
        },
        'ROI_HEAD': {
            'NAME': 'PointRCNNHead',
            'CLASS_AGNOSTIC': True,
            'ROI_POINT_POOL': {
                # generous so sparse synthetic clouds still pool points
                'POOL_EXTRA_WIDTH': [8.0, 8.0, 8.0],
                'NUM_SAMPLED_POINTS': 32,
                'DEPTH_NORMALIZER': 70.0,
            },
            'XYZ_UP_LAYER': [16, 16],
            'CLS_FC': [32], 'REG_FC': [32],
            'DP_RATIO': 0.0, 'USE_BN': False,
            'SA_CONFIG': {
                'NPOINTS': [16, 8, -1],
                'RADIUS': [0.2, 0.4, 100],
                'NSAMPLE': [4, 4, 4],
                'MLPS': [[16, 16], [16, 32], [32, 64]],
            },
            'NMS_CONFIG': {
                'TRAIN': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                          'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16,
                          'NMS_THRESH': 0.8},
                'TEST': {'NMS_TYPE': 'nms_gpu', 'MULTI_CLASSES_NMS': False,
                         'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 8,
                         'NMS_THRESH': 0.85},
            },
            'TARGET_CONFIG': {
                'BOX_CODER': 'ResidualCoder',
                'ROI_PER_IMAGE': 16, 'FG_RATIO': 0.5,
                'SAMPLE_ROI_BY_EACH_CLASS': True,
                'CLS_SCORE_TYPE': 'cls',
                'CLS_FG_THRESH': 0.6, 'CLS_BG_THRESH': 0.45,
                'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
                'REG_FG_THRESH': 0.55,
            },
            'LOSS_CONFIG': {
                'CLS_LOSS': 'BinaryCrossEntropy',
                'REG_LOSS': 'smooth-l1',
                'CORNER_LOSS_REGULARIZATION': True,
                'LOSS_WEIGHTS': {
                    'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                    'rcnn_corner_weight': 1.0, 'code_weights': [1.0] * 7,
                },
            },
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7],
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {
                'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 64,
                'NMS_POST_MAXSIZE': 16,
            },
        },
    })


def tiny_pointpillar_cfg() -> EDict:
    """Tiny PointPillars over a small BEV grid (CPU-fast)."""
    return EDict({
        'NAME': 'PointPillar',
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSOLUTE_XYZ': True, 'USE_NORM': True,
                'NUM_FILTERS': [32]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 32},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [2, 2], 'LAYER_STRIDES': [2, 2],
                        'NUM_FILTERS': [32, 64],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [64, 64]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle',
            'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0,
            'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
                {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-0.6],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
                {'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-0.6],
                 'align_center': False, 'feature_map_stride': 2,
                 'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
            ],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner',
                'POS_FRACTION': -1.0, 'SAMPLE_SIZE': 512,
                'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder',
            },
            'LOSS_CONFIG': {
                'LOSS_WEIGHTS': {'cls_weight': 1.0, 'loc_weight': 2.0,
                                 'dir_weight': 0.2,
                                 'code_weights': [1.0] * 7},
            },
        },
        'POST_PROCESSING': {
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7],
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 256,
                           'NMS_POST_MAXSIZE': 32},
        },
    })


def tiny_centerpoint_cfg() -> EDict:
    """Tiny CenterPoint-pillar (CPU-fast)."""
    cfg = tiny_pointpillar_cfg()
    cfg.NAME = 'CenterPoint'
    cfg.DENSE_HEAD = EDict({
        'NAME': 'CenterHead',
        'CLASS_AGNOSTIC': False,
        'SHARED_CONV_CHANNEL': 32,
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 2,
            'NUM_MAX_OBJS': 32,
            'GAUSSIAN_OVERLAP': 0.1,
            'MIN_RADIUS': 2,
        },
        'POST_CONFIG': {'MAX_OBJ_PER_SAMPLE': 32},
        'LOSS_CONFIG': {
            'LOSS_WEIGHTS': {'cls_weight': 1.0, 'loc_weight': 2.0,
                             'code_weights': [1.0] * 8},
        },
    })
    return cfg


def tiny_optimization_cfg() -> EDict:
    return EDict({
        'BATCH_SIZE_PER_GPU': 8, 'NUM_EPOCHS': 2,
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.002, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'DECAY_STEP_LIST': [35, 45], 'LR_DECAY': 0.1,
        'LR_CLIP': 0.0000001, 'LR_WARMUP': False, 'WARMUP_EPOCH': 1,
        'GRAD_NORM_CLIP': 10,
    })
