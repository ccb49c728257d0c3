from .voxel_set_abstraction import VoxelSetAbstraction

__all__ = {
    'VoxelSetAbstraction': VoxelSetAbstraction,
}


def build_pfe(name, **kwargs):
    return __all__[name](**kwargs)
