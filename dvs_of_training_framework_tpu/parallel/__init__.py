from .distributed import (make_global_batch, maybe_initialize_distributed)
from .mesh import (make_mesh, make_sharded_eval_step,
                   make_sharded_fused_window_step,
                   make_sharded_train_step, shard_host_batch,
                   split_batch_for_mesh)

__all__ = ['make_global_batch', 'make_mesh', 'make_sharded_eval_step',
           'make_sharded_fused_window_step', 'make_sharded_train_step',
           'maybe_initialize_distributed', 'shard_host_batch',
           'split_batch_for_mesh']
