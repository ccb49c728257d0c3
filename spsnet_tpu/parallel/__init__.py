from .mesh import make_mesh, shard_batch, replicate, host_local_batch_size

__all__ = ['make_mesh', 'shard_batch', 'replicate', 'host_local_batch_size']
