"""Training-state checkpointing (params + optimizer state + step).

The reference only persists keras weight files (SURVEY.md §5
checkpoint row: no optimizer state, no resume). Here full resume is
first-class via Orbax (async-capable, sharding-aware); plain weight
files remain available through ``Model.save_weights``.
"""

import os
from typing import Any, Optional


def save_checkpoint(path: str, state, keep: int = 3) -> str:
    """Save a TrainState under ``path/step_N``; returns the directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    step = int(state.step)
    ckpt_dir = os.path.join(path, f"step_{step}")
    ckpter = ocp.PyTreeCheckpointer()
    ckpter.save(ckpt_dir, state._asdict(), force=True)

    # prune old checkpoints
    entries = sorted(
        (e for e in os.listdir(path) if e.startswith("step_")),
        key=lambda e: int(e.split("_")[1]))
    for stale in entries[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(path, stale))
    return ckpt_dir


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    entries = sorted(
        (e for e in os.listdir(path) if e.startswith("step_")),
        key=lambda e: int(e.split("_")[1]))
    return os.path.join(path, entries[-1]) if entries else None


def restore_checkpoint(ckpt_dir: str, state):
    """Restore into the structure of ``state`` (a TrainState)."""
    import orbax.checkpoint as ocp

    ckpter = ocp.PyTreeCheckpointer()
    restored = ckpter.restore(ckpt_dir, item=state._asdict())
    return type(state)(**restored)
