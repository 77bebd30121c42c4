"""Engine for simplex-mesh scenarios (BASELINE config 5).

Builds the static gather tables host-side, then runs a jitted lax.scan time
loop identical in structure to the structured Engine. Snapshots write .vtu
(gcm_tpu.snapshot.vtk.write_vtu).
"""

from __future__ import annotations

import dataclasses
import time as _time
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcm_tpu.grids.simplex import (
    SimplexGrid, build_foot_tables, build_foot_tables_for_model,
)
from gcm_tpu.materials import (
    IsotropicMaterial, MaterialFields, OrthotropicMaterial,
    OrthotropicMaterialFields,
)
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.simplex_gcm import simplex_step


@dataclasses.dataclass
class SimplexRunResult:
    u: np.ndarray
    nsteps: int
    dt: float
    wall_seconds: float
    points_per_second: float


class SimplexEngine:
    """Engine over one simplex body.

    ``border_kind``: one condition for the whole hull (a kind string or a
    task.BorderSpec). ``borders``: per-area conditions instead — a sequence
    of ``(Area-or-node-mask, BorderSpec)`` applied over ``border_kind`` as
    the default (e.g. free surface on top, absorbing sides — the config-4
    geometry on an unstructured body). Works on imported/non-convex meshes
    (SimplexGrid.from_cells / load_msh).
    """

    def __init__(
        self,
        grid: SimplexGrid,
        model_name: str,
        material: "IsotropicMaterial | OrthotropicMaterial",
        cfl: float = 0.8,
        border_kind: "str | object" = "absorbing",   # kind or task.BorderSpec
        u0: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        borders: Optional[Sequence[Tuple[object, object]]] = None,
    ):
        self.grid = grid
        self.model = get_model(model_name)
        ones = np.ones(grid.npoints)
        if isinstance(material, OrthotropicMaterial):
            self.mat = OrthotropicMaterialFields.from_constants(
                material.rho * ones,
                {k: v * ones for k, v in material.constants().items()},
                xp=jnp, dtype=dtype,
            )
        else:
            self.mat = MaterialFields.from_arrays(
                material.rho * ones, material.lam * ones, material.mu * ones,
                xp=jnp, dtype=dtype,
            )
        # characteristic length: mean nearest-neighbor distance
        from scipy.spatial import cKDTree

        d, _ = cKDTree(grid.points).query(grid.points, k=2)
        h_min = float(d[:, 1].min())
        self.dt = cfl * h_min / self.mat.max_cp()
        if borders is not None:
            from gcm_tpu.solver.simplex_gcm import build_node_borders
            from gcm_tpu.task import BorderSpec

            default = (BorderSpec(border_kind)
                       if isinstance(border_kind, str) else border_kind)
            self.border_kind = build_node_borders(grid, borders, default)
        else:
            self.border_kind = border_kind
        if isinstance(self.mat, MaterialFields):
            waves = {"p": np.asarray(self.mat.cp)}
            if float(np.asarray(self.mat.cs).max()) > 0:
                waves["s"] = np.asarray(self.mat.cs)
            self.tables = build_foot_tables(grid, waves, self.dt)
        else:
            # anisotropic: per-pair feet (different speeds per sweep/pair)
            self.tables = build_foot_tables_for_model(
                grid, self.model, self.mat, self.dt)
        self.u = jnp.asarray(
            u0 if u0 is not None
            else np.zeros((self.model.ncomp, grid.npoints)),
            dtype=dtype,
        )

    def run(self, nsteps: int) -> SimplexRunResult:
        model, mat, tables, border = (
            self.model, self.mat, self.tables, self.border_kind
        )

        @partial(jax.jit, donate_argnums=0)
        def scan_all(u):
            def body(u, _):
                return simplex_step(model, u, mat, tables, border), ()

            return jax.lax.scan(body, u, None, length=nsteps)[0]

        t0 = _time.perf_counter()
        u = scan_all(self.u)
        u.block_until_ready()
        wall = _time.perf_counter() - t0
        self.u = u
        return SimplexRunResult(
            u=np.asarray(jax.device_get(u)),
            nsteps=nsteps,
            dt=self.dt,
            wall_seconds=wall,
            points_per_second=self.grid.npoints * nsteps / max(wall, 1e-12),
        )

    def write_snapshot(self, path: str) -> None:
        from gcm_tpu.snapshot.vtk import write_vtu

        u = np.asarray(jax.device_get(self.u))
        fields = {n: u[i] for i, n in enumerate(self.model.comp_names)}
        fields["velocity"] = u[self.model.vel_slice]
        write_vtu(path, self.grid.points, self.grid.cells, fields)
