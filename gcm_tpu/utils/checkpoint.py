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
    has_traces = isinstance(state, dict) and "traces" in state
    if has_traces:
        state = dict(state)
        traces = state.pop("traces")
    directory = os.path.abspath(directory)
    if has_traces:
        # sidecar FIRST and atomically: a completed orbax step must imply
        # its sidecar exists — a preemption between the two would
        # otherwise resume with the whole pre-resume seismogram silently
        # dropped, and a mid-write kill would brick --resume with a
        # truncated npz (code-review r5)
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"traces_{step}.npz")
        # must end in .npz or np.savez appends the suffix itself
        tmp = f"{path}.{os.getpid()}.tmp.npz"
        if isinstance(traces, dict):
            # multi-body record: one array per body
            np.savez(tmp, **{f"body:{k}": np.asarray(v)
                             for k, v in traces.items()})
        else:
            np.savez(tmp, traces=np.asarray(traces))
        os.replace(tmp, path)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    keep = set(mgr.all_steps())
    mgr.close()
    # rotate sidecars with orbax's max_to_keep (they grow with the step —
    # unbounded retention is O(T^2) disk on long runs)
    import glob as _glob
    import re as _re

    for f in _glob.glob(os.path.join(directory, "traces_*.npz")):
        m = _re.fullmatch(r"traces_(\d+)\.npz", os.path.basename(f))
        if m and int(m.group(1)) not in keep:
            try:
                os.unlink(f)
            except OSError:
                pass


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
    wants_traces = isinstance(state_like, dict) and "traces" in state_like
    if wants_traces:
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
    # only attach when the caller's template asked for traces — a stale
    # sidecar from another run sharing the directory must not leak into
    # a detector-free restore (code-review r5)
    if wants_traces and isinstance(out, dict) and os.path.exists(sidecar):
        out = dict(out)
        try:
            with np.load(sidecar) as z:
                if "traces" in z.files:
                    out["traces"] = z["traces"]
                else:
                    out["traces"] = {k.split(":", 1)[1]: z[k]
                                     for k in z.files
                                     if k.startswith("body:")}
        except Exception as e:
            raise ValueError(
                f"corrupt detector-trace sidecar {sidecar}: {e}; delete "
                "it to resume without the pre-resume seismogram") from e
    return out


def _abstractify(tree):
    import jax

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        return x

    return jax.tree.map(leaf, tree)
