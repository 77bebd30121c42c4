"""Shared /tmp cache of the expensive host-side simplex setup.

The 65^3 Delaunay + foot-table build costs ~14 min host-side; bench.py and
every tools/simplex_*_probe.py reuse one pickle per mesh size so tunnel
retries and follow-up probes don't pay it again. This module is the ONLY
owner of the cache format — probes drifting to an older tuple layout is
exactly the failure this replaces (code-review r5).

Format: ``(CACHE_V, SimplexGrid, tables, dt)``. Bump :data:`CACHE_V`
whenever the grid or foot-table pickle formats change so stale records
rebuild instead of silently flowing into probes.
"""

from __future__ import annotations

import os
import pickle

CACHE_V = "r5a"


def cache_path(n: int) -> str:
    return f"/tmp/simplex_probe_setup_{n}.pkl"


def load(n: int):
    """Return ``(grid, tables, dt)`` or ``None`` when absent/stale."""
    path = cache_path(n)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        rec = pickle.load(f)
    if not (isinstance(rec, tuple) and len(rec) == 4
            and rec[0] == CACHE_V):
        return None          # stale format from another round
    return rec[1], rec[2], rec[3]


def save(n: int, grid, tables, dt: float) -> None:
    from gcm_tpu.grids.simplex import SimplexGrid

    # atomic publish: concurrent readers (bench workers racing a
    # prebuild) must never see a partially-written pickle
    path = cache_path(n)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(
            (CACHE_V, SimplexGrid(points=grid.points, cells=grid.cells),
             tables, dt), f)
    os.replace(tmp, path)


def load_or_build(n: int, mat, jitter: float = 0.15):
    """``(grid, tables, dt)`` for the standard jittered unit box at
    ``n``^3 lattice resolution, building (and caching) on a miss."""
    rec = load(n)
    if rec is not None:
        return rec
    import jax.numpy as jnp
    import numpy as np

    from gcm_tpu.engine_simplex import SimplexEngine
    from gcm_tpu.grids.simplex import SimplexGrid

    grid = SimplexGrid.box((0, 0, 0), (1.0, 1.0, 1.0), (n, n, n),
                           jitter=jitter)
    u0 = np.zeros((9, grid.npoints), np.float32)
    eng = SimplexEngine(grid, "elastic3d", mat, cfl=0.8, u0=u0,
                        dtype=jnp.float32, kernel="jnp")
    save(n, grid, eng.tables, eng.dt)
    return grid, eng.tables, eng.dt


def engine_from_parts(mat, grid, tables, dt, u0, border_kind="absorbing"):
    """Reconstruct the minimal SimplexEngine the probes/bench drive
    (sweep fields only — no sources/detectors/snapshotters)."""
    import jax.numpy as jnp

    from gcm_tpu.engine_simplex import SimplexEngine, _material_fields
    from gcm_tpu.models.spec import get_model

    eng = SimplexEngine.__new__(SimplexEngine)
    eng.model = get_model("elastic3d")
    eng.mat = _material_fields(mat, grid.npoints, jnp.float32)
    eng.tables = tables
    eng.dt = dt
    eng.border_kind = border_kind
    eng.u = jnp.asarray(u0)
    eng.stencil_compressed = {str(k): t.stencil is not None
                              for k, t in tables.items()}
    return eng
