from .vfe_modules import MeanVFE, PillarVFE

__all__ = {
    'MeanVFE': MeanVFE,
    'PillarVFE': PillarVFE,
}


def build_vfe(name, **kwargs):
    return __all__[name](**kwargs)
