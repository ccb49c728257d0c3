from .vfe_modules import MeanVFE, PillarVFE, DynamicPillarVFE

__all__ = {
    'MeanVFE': MeanVFE,
    'PillarVFE': PillarVFE,
    'DynamicPillarVFE': DynamicPillarVFE,
    # ``DynamicMeanVFE`` (vfe/dynamic_mean_vfe.py) exists to skip the padded
    # (V, P, C) intermediate on GPU; the TPU path needs host-planned sparse
    # conv tables anyway, so MeanVFE over the host layout is the equivalent
    'DynamicMeanVFE': MeanVFE,
    # reference registry name used by cbgs_dyn_pp_centerpoint.yaml
    'DynPillarVFE': DynamicPillarVFE,
}


def build_vfe(name, **kwargs):
    return __all__[name](**kwargs)
