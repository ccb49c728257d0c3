from .base_bev_backbone import BaseBEVBackbone

__all__ = {
    'BaseBEVBackbone': BaseBEVBackbone,
}


def build_backbone_2d(name, **kwargs):
    return __all__[name](**kwargs)
