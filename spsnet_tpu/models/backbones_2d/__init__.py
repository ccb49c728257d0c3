from .al_2d import CPUnet
from .base_bev_backbone import BaseBEVBackbone, RBFusion
from .unets import UNet

# Registry parity with the reference (backbones_2d/__init__.py:6-11):
# U_Net and CP_Unet are registered there too, though no shipped config
# names them (CP_Unet is instantiated directly by the AL 3D backbones).
__all__ = {
    'BaseBEVBackbone': BaseBEVBackbone,
    'RB_Fusion': RBFusion,
    'RBFusion': RBFusion,
    'U_Net': UNet,
    'CP_Unet': CPUnet,
}


def build_backbone_2d(name, **kwargs):
    return __all__[name](**kwargs)
