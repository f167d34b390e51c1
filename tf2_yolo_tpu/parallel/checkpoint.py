"""Training-state checkpointing (params + optimizer state + step).

The reference only persists keras weight files (SURVEY.md §5
checkpoint row: no optimizer state, no resume). Here full resume is
first-class via Orbax — including ASYNC saves (the SURVEY §5 plan):
``save_checkpoint(..., block=False)`` snapshots the state to host
synchronously (so the next train step can mutate it immediately) and
writes in Orbax's background thread, overlapping the checkpoint IO
with training. Plain weight files remain available through
``Model.save_weights``.

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
Async saves fall back to blocking there (the barrier serializes the
processes anyway).
"""

import os
import re
from typing import Any, Optional

_STEP_DIR = re.compile(r"^step_(\d+)$")

# one background-writer Checkpointer per process (AsyncCheckpointer
# owns a thread pool; per-save construction would leak threads)
_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp
        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write committed."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def _fetch_host(tree, check_replicated=True):
    """Fetch a state tree to host numpy (the synchronous snapshot that
    makes an async save safe against the next optimizer update)."""
    import jax
    import numpy as np

    def fetch(leaf):
        if (check_replicated and isinstance(leaf, jax.Array)
                and not leaf.is_fully_replicated):
            raise ValueError(
                "multi-process checkpointing requires fully-replicated "
                "train state (data-parallel / spatial training); "
                "tensor-parallel sharded state is not supported yet — "
                "use save_weights()")
        return np.asarray(leaf)

    return jax.tree_util.tree_map(fetch, tree)


def _step_dirs(path: str):
    """Committed step_N entries, sorted by N. In-flight Orbax tmp dirs
    (``step_N.orbax-checkpoint-tmp-*``) are excluded — Orbax commits
    atomically by renaming, so a listed exact match is complete."""
    out = []
    for e in os.listdir(path):
        m = _STEP_DIR.match(e)
        if m:
            out.append((int(m.group(1)), e))
    return [e for _, e in sorted(out)]


def _prune(path: str, keep: int) -> None:
    # keep < 1 would make entries[:-keep] an empty/backwards slice and
    # silently keep everything — the latest checkpoint is always kept
    keep = max(int(keep), 1)
    for stale in _step_dirs(path)[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(path, stale))


def save_checkpoint(path: str, state, keep: int = 3,
                    block: bool = True) -> str:
    """Save a TrainState under ``path/step_N``; returns the directory.

    ``block=False`` (single-process): snapshot to host now, write in
    the background — call ``wait_for_saves()`` (or restore/save again)
    to fence. Collective under multi-process JAX: call from every
    process; ``block`` is ignored there (saves are synchronous).
    """
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
    elif not block:
        # sequence the writes ourselves: one in flight at a time keeps
        # tensorstore IO off the critical path without unbounded queues
        wait_for_saves()
        tree = _fetch_host(state._asdict(), check_replicated=False)
        _async_checkpointer().save(ckpt_dir, tree, force=True)
        _prune(path, keep)   # old committed steps only (_step_dirs
        #                      skips the tmp dir of the write in flight)
    else:
        # fence in-flight async writes first: otherwise _prune here can
        # race a background commit (a pruned step dir reappearing after
        # its rename-commit), and a same-step blocking save could
        # collide with its async write in flight
        wait_for_saves()
        ocp.PyTreeCheckpointer().save(ckpt_dir, state._asdict(),
                                      force=True)
        _prune(path, keep)
    return ckpt_dir


def latest_checkpoint(path: str) -> Optional[str]:
    wait_for_saves()
    if not os.path.isdir(path):
        return None
    entries = _step_dirs(path)
    return os.path.join(path, entries[-1]) if entries else None


def restore_checkpoint(ckpt_dir: str, state):
    """Restore into the structure of ``state`` (a TrainState).

    Multi-process: every process reads the (shared-filesystem)
    checkpoint into host numpy; the engine re-places the state onto
    the global mesh on the next step (``_state_mesh`` reset)."""
    import jax
    import orbax.checkpoint as ocp

    wait_for_saves()
    template = state._asdict()
    if jax.process_count() > 1:
        template = _fetch_host(template)
    restored = ocp.PyTreeCheckpointer().restore(ckpt_dir, item=template)
    return type(state)(**restored)
