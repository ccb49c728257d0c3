from .pointpillar_scatter import PointPillarScatter

__all__ = {
    'PointPillarScatter': PointPillarScatter,
}


def build_map_to_bev(name, **kwargs):
    return __all__[name](**kwargs)
