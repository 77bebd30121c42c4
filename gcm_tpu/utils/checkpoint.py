"""Checkpoint / resume of simulation state (SURVEY.md §5).

The reference has no restartable checkpointing (VTK snapshots are
output-only); this framework checkpoints the full state pytree — fields,
fracture bond masks, step counter — with orbax, so long runs survive
preemption and multi-host restarts (orbax handles sharded jax.Arrays
natively).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(directory: str, step: int, state: Dict[str, Any]) -> None:
    """Save ``state`` (an arbitrary pytree of arrays) at ``step``.

    A top-level ``"traces"`` entry (the accumulated detector record) is
    stored as an npz SIDECAR rather than in the orbax tree: its leading
    dimension grows with the step, and orbax's StandardRestore requires
    the restore template's shapes to match the saved ones — which a fresh
    engine cannot know (code-review r5)."""
    import orbax.checkpoint as ocp

    traces = None
    if isinstance(state, dict) and "traces" in state:
        state = dict(state)
        traces = state.pop("traces")
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if traces is not None:
        os.makedirs(directory, exist_ok=True)
        np.savez(os.path.join(os.path.abspath(directory),
                              f"traces_{step}.npz"),
                 traces=np.asarray(traces))


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, state_like: Dict[str, Any],
                       step: Optional[int] = None) -> Dict[str, Any]:
    """Restore the pytree saved at ``step`` (default: latest)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint found under {directory}")
    if isinstance(state_like, dict) and "traces" in state_like:
        state_like = {k: v for k, v in state_like.items() if k != "traces"}
    abstract = _abstractify(state_like)
    try:
        out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    except ValueError:
        if not (isinstance(abstract, dict) and "points_md5" in abstract):
            raise
        # checkpoints written before the node-numbering fingerprint
        # (round 5) lack the key; restore without it — the engine then
        # skips the (unverifiable) check
        abstract = {k: v for k, v in abstract.items() if k != "points_md5"}
        out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    sidecar = os.path.join(os.path.abspath(directory),
                           f"traces_{step}.npz")
    if isinstance(out, dict) and os.path.exists(sidecar):
        out = dict(out)
        out["traces"] = np.load(sidecar)["traces"]
    return out


def _abstractify(tree):
    import jax

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        return x

    return jax.tree.map(leaf, tree)
