"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md §2.3: no tf.distribute
anywhere); here data parallelism is first-class: a 1-axis ``data``
mesh (extensible with a ``model`` axis) over which the train step is
jit-compiled with GSPMD sharding annotations. Gradient all-reduce and
cross-replica BatchNorm statistics come out of XLA's partitioner as
ICI collectives — no hand-written communication.
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("data", "model") mesh.

    Args:
        n_data: size of the data axis (default: all devices / n_model).
        n_model: size of the model axis (reserved for future tensor
            parallelism; 1 for these CNN sizes).
        devices: explicit device list (default jax.devices()).
    """
    return _mesh2(n_data, n_model, devices, ("data", "model"))


def _mesh2(n_data, n_second, devices, axes) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_second
    use = np.array(devices[:n_data * n_second]).reshape(n_data, n_second)
    return Mesh(use, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tensor_parallel_shardings(tree, mesh: Mesh, min_channels: int = 128,
                              axis: str = "model"):
    """Megatron-style channel sharding rules for conv nets, as a
    pytree of NamedShardings matching ``tree`` (params, batch_stats, a
    whole TrainState — any pytree of arrays).

    Per leaf:
      - 4D conv kernels (H, W, Cin, Cout) with Cout divisible by the
        ``axis`` size and >= ``min_channels``: sharded on Cout.
      - 2D dense kernels (Cin, Cout): same rule on Cout.
      - 1D per-channel vectors (conv bias, BN scale/bias and moving
        stats) meeting the same size rule: sharded on their only dim —
        they pair with the conv whose Cout they match by construction.
      - everything else (small kernels, fused detection heads below
        the channel gate, anchors, optimizer scalars): replicated.

    XLA's SPMD partitioner then derives every activation sharding and
    inserts the cross-partition collectives (the Cin contraction
    all-reduces ride ICI). The reference has no model-parallel story
    at all (SURVEY.md §2.3: absent); at these model sizes TP is about
    fitting wider variants / larger inputs per chip, not speed — data
    parallelism remains the default (``make_mesh(n_model=1)``).
    """
    n = mesh.shape[axis]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 2 and shape[-1] >= min_channels \
                and shape[-1] % n == 0:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [axis])))
        if len(shape) == 1 and shape[0] >= min_channels \
                and shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)


def make_mesh_spatial(n_data: Optional[int] = None, n_space: int = 1,
                      devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("data", "space") mesh for spatial partitioning.

    For inputs too large to fit one chip's HBM per-sample (the
    SURVEY §2.3 "large-input axis": high-resolution images rather
    than sequence length), the image HEIGHT dim is sharded over the
    ``space`` axis; XLA's SPMD partitioner inserts the halo exchanges
    the convolutions need at shard boundaries automatically. The
    reference can only lower the resolution (reshape_anchors,
    yolov4/__init__.py:169-188) — it has no multi-device answer.
    """
    return _mesh2(n_data, n_space, devices, ("data", "space"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC images: batch over ``data``, height over ``space``."""
    return NamedSharding(mesh, P("data", "space"))


def best_data_axis(batch_size: int, max_devices: Optional[int] = None
                   ) -> int:
    """Largest device count <= max_devices that divides batch_size
    (GSPMD shards must be equal-sized)."""
    n = max_devices if max_devices is not None else len(jax.devices())
    for k in range(min(n, batch_size), 0, -1):
        if batch_size % k == 0:
            return k
    return 1
