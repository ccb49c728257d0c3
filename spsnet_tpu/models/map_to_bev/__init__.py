from .pointpillar_scatter import PointPillarScatter

__all__ = {
    'PointPillarScatter': PointPillarScatter,
    # reference ``Sparse2BEV`` (pointpillar_scatter.py:99) is the same dense
    # scatter of pillar features by (y, x) voxel coords
    'Sparse2BEV': PointPillarScatter,
}


def build_map_to_bev(name, **kwargs):
    return __all__[name](**kwargs)
