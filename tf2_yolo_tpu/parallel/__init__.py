"""Parallelism: mesh construction, sharded train steps, checkpoints."""

from .mesh import (make_mesh, make_mesh_spatial, batch_sharding,
                   spatial_sharding, replicated, best_data_axis,
                   tensor_parallel_shardings)
from .train import (TrainState, create_train_state, make_train_step,
                    make_eval_step, make_optimizer)
from .checkpoint import (save_checkpoint, restore_checkpoint,
                         latest_checkpoint, wait_for_saves)
from .input import put_global_batch, process_batch_slice
from .multihost import distributed_initialize, is_multiprocess
from .pipeline import PipelineExecutor, split_detector, split_yolov4

__all__ = [
    "make_mesh", "make_mesh_spatial", "batch_sharding",
    "spatial_sharding", "replicated", "best_data_axis",
    "tensor_parallel_shardings",
    "TrainState", "create_train_state", "make_train_step",
    "make_eval_step", "make_optimizer",
    "save_checkpoint", "restore_checkpoint", "latest_checkpoint",
    "wait_for_saves",
    "put_global_batch", "process_batch_slice",
    "distributed_initialize", "is_multiprocess",
    "PipelineExecutor", "split_detector", "split_yolov4",
]
