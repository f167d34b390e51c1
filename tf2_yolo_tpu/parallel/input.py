"""Host-to-device input placement, single- and multi-process.

The reference is single-process (SURVEY.md §2.3); its only input
parallelism is thread fan-out. On a real TPU slice each host process
feeds only its local chips, so a global batch is assembled from
per-process pieces: every process loads a DISJOINT slice of the
global batch (e.g. dataset file shards by ``jax.process_index()``)
and :func:`put_global_batch` binds those local rows into one global
jax.Array sharded over the mesh's data axis —
``jax.make_array_from_process_local_data`` does the binding without
any cross-host copy of the data itself.

In a single process this degrades to a plain sharded device_put, so
the same train-loop code runs unchanged from 1 chip to a multi-host
slice (the engine's device_put path is equivalent there; this module
is the explicit multi-host entry point).
"""

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global_batch(mesh: Mesh, batch: Any, axis: str = "data"):
    """Bind per-process batch rows into a global batch sharded on
    ``axis``.

    Args:
        mesh: the device mesh (its ``axis`` spans the global batch).
        batch: array or pytree of arrays. In a multi-process run,
            each process passes ITS OWN rows — ``global_rows /
            process_count`` of them, loader-sharded by
            ``jax.process_index()``. In a single process, the whole
            batch.
        axis: mesh axis name the leading dim is sharded over.

    Returns:
        pytree of global jax.Arrays sharded ``P(axis)`` over the mesh.
    """
    sharding = NamedSharding(mesh, P(axis))

    def bind(a):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(a))

    return jax.tree_util.tree_map(bind, batch)


def process_batch_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this process should load.

    Even split by process index; requires the global batch to divide
    by the process count (GSPMD equal-shard rule).
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} must divide by the "
            f"process count {n}")
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
