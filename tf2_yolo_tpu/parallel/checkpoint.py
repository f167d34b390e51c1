"""Training-state checkpointing (params + optimizer state + step).

The reference only persists keras weight files (SURVEY.md §5
checkpoint row: no optimizer state, no resume). Here full resume is
first-class via Orbax (async-capable, sharding-aware); plain weight
files remain available through ``Model.save_weights``.

Multi-process (multi-host) runs: the train state under data-parallel /
spatial training is fully replicated across the global mesh, so every
process fetches it to host memory (an addressable no-copy read of a
replicated array) and all call the Orbax save collectively — Orbax
gates the actual tensorstore writes to process 0 (NumpyHandler
``_background_serialize``: ``process_index() == 0``) and runs its own
save/finalize barriers through the jax.distributed client; old-step
pruning is process-0-only behind a device barrier. The checkpoint
path must live on a filesystem visible to every host (the standard
cloud-TPU setup). ``save_checkpoint`` / ``restore_checkpoint`` are
COLLECTIVE in that mode: every process must call them at the same
point (engine.fit does; cloud preemption delivers SIGTERM to every
host, so the ``checkpoint_on_interrupt`` path is symmetric too).
"""

import os
from typing import Any, Optional


def _fetch_host(tree):
    """Fetch a replicated state tree to host numpy on every process."""
    import jax
    import numpy as np

    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            raise ValueError(
                "multi-process checkpointing requires fully-replicated "
                "train state (data-parallel / spatial training); "
                "tensor-parallel sharded state is not supported yet — "
                "use save_weights()")
        return np.asarray(leaf)

    return jax.tree_util.tree_map(fetch, tree)


def _prune(path: str, keep: int) -> None:
    entries = sorted(
        (e for e in os.listdir(path) if e.startswith("step_")),
        key=lambda e: int(e.split("_")[1]))
    for stale in entries[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(path, stale))


def save_checkpoint(path: str, state, keep: int = 3) -> str:
    """Save a TrainState under ``path/step_N``; returns the directory.

    Collective under multi-process JAX: call from every process."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    step = int(state.step)
    ckpt_dir = os.path.join(path, f"step_{step}")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # collective: every process participates in Orbax's internal
        # barriers; tensorstore writes happen on process 0 only
        tree = _fetch_host(state._asdict())
        ocp.PyTreeCheckpointer().save(ckpt_dir, tree, force=True)
        if jax.process_index() == 0:
            _prune(path, keep)
        # no process lists/reads checkpoints until pruning finished
        multihost_utils.sync_global_devices(f"tf2yolo_ckpt_{step}")
    else:
        ocp.PyTreeCheckpointer().save(ckpt_dir, state._asdict(),
                                      force=True)
        _prune(path, keep)
    return ckpt_dir


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    entries = sorted(
        (e for e in os.listdir(path) if e.startswith("step_")),
        key=lambda e: int(e.split("_")[1]))
    return os.path.join(path, entries[-1]) if entries else None


def restore_checkpoint(ckpt_dir: str, state):
    """Restore into the structure of ``state`` (a TrainState).

    Multi-process: every process reads the (shared-filesystem)
    checkpoint into host numpy; the engine re-places the state onto
    the global mesh on the next step (``_state_mesh`` reset)."""
    import jax
    import orbax.checkpoint as ocp

    template = state._asdict()
    if jax.process_count() > 1:
        template = _fetch_host(template)
    restored = ocp.PyTreeCheckpointer().restore(ckpt_dir, item=template)
    return type(state)(**restored)
