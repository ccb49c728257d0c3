from .base_bev_backbone import BaseBEVBackbone, RBFusion

__all__ = {
    'BaseBEVBackbone': BaseBEVBackbone,
    'RB_Fusion': RBFusion,
    'RBFusion': RBFusion,
}


def build_backbone_2d(name, **kwargs):
    return __all__[name](**kwargs)
