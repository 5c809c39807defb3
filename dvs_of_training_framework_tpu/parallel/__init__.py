from .mesh import (make_mesh, make_sharded_train_step, shard_host_batch,
                   split_batch_for_mesh)

__all__ = ['make_mesh', 'make_sharded_train_step', 'shard_host_batch',
           'split_batch_for_mesh']
