from .iassd_backbone import IASSDBackbone
from .pointnet2_backbone import PointNet2MSG

__all__ = {
    'IASSD_Backbone': IASSDBackbone,
    'PAGNet_Backbone': IASSDBackbone,  # same class; USE_SURFACE/stds via config
    'PointNet2MSG': PointNet2MSG,
}


def build_backbone_3d(name, **kwargs):
    return __all__[name](**kwargs)
