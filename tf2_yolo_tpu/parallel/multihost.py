"""Multi-process (multi-host) runtime initialization.

A real TPU slice runs ONE Python process per host, each owning the
host's local chips; `jax.distributed` wires the processes into one
global device mesh. The reference is strictly single-process
(SURVEY.md §2.3 — no tf.distribute anywhere), so this layer is new.

Usage on a pod: call :func:`distributed_initialize` first thing in
every process (on Cloud TPU the coordinator/process topology is
auto-detected from the environment, so no arguments are needed), then
build models and call ``Model.fit`` exactly like single-host code —
each process passes its OWN shard of the dataset and the engine binds
the per-process batches into global arrays over the full mesh
(`jax.make_array_from_process_local_data`; see parallel/input.py).

For development and CI without a pod, the same path runs as N
processes on one machine with virtual CPU devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=K``) and gloo
cross-process collectives — tests/test_multihost.py drives a real
2-process run this way and asserts exact equality with the
single-process computation.
"""

from typing import Optional

import jax


def distributed_initialize(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> None:
    """Initialize the JAX distributed runtime for a multi-process run.

    Thin wrapper over ``jax.distributed.initialize`` that additionally
    selects the gloo cross-process collectives implementation for the
    CPU backend (required for multi-process CPU runs; a no-op for TPU,
    whose collectives ride ICI/DCN natively).

    Args:
        coordinator_address: "host:port" of process 0. On Cloud TPU
            leave all three as None — the topology is auto-detected.
        num_processes: total process count.
        process_id: this process's index in [0, num_processes).
        **kwargs: forwarded to ``jax.distributed.initialize``
            (e.g. ``local_device_ids``).
    """
    # Must be set before the CPU backend initializes; harmless for TPU.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id, **kwargs)


def is_multiprocess() -> bool:
    """True when running under a multi-process (multi-host) runtime."""
    return jax.process_count() > 1
