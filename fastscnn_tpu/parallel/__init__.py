from fastscnn_tpu.parallel.mesh import make_mesh, make_mesh_for_batch, batch_sharding, replicate_sharding
from fastscnn_tpu.parallel.multihost import initialize_multihost, host_shard, is_primary_host
from fastscnn_tpu.parallel.train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_split_aug_train_step,
    make_eval_step,
    make_optimizer,
)

__all__ = [
    "make_mesh",
    "make_mesh_for_batch",
    "batch_sharding",
    "replicate_sharding",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_split_aug_train_step",
    "make_eval_step",
    "make_optimizer",
]
