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
    traces: Optional[np.ndarray] = None   # [nsteps, npoints, ncomp]


class SimplexEngine:
    """Engine over one simplex body.

    ``border_kind``: one condition for the whole hull (a kind string or a
    task.BorderSpec). ``borders``: per-area conditions instead — a sequence
    of ``(Area-or-node-mask, BorderSpec)`` applied over ``border_kind`` as
    the default (e.g. free surface on top, absorbing sides — the config-4
    geometry on an unstructured body). Works on imported/non-convex meshes
    (SimplexGrid.from_cells / load_msh).

    ``sources``: Ricker/Wavelet point sources injected at the node nearest
    each source position; ``detector_points``: receiver locations whose
    nearest-node state is accumulated on device every step (seismograms) —
    the reference Detector on an unstructured mesh.
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
        sources: Sequence[object] = (),
        detector_points: Optional[Sequence[Sequence[float]]] = None,
    ):
        self.grid = grid
        self.model = get_model(model_name)
        self.mat = _material_fields(material, grid.npoints, dtype)
        # characteristic length: minimum nearest-neighbor distance
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
        self.tables = _foot_tables(grid, self.model, self.mat, self.dt)
        self.u = jnp.asarray(
            u0 if u0 is not None
            else np.zeros((self.model.ncomp, grid.npoints)),
            dtype=dtype,
        )
        self.dtype = dtype
        # nearest-node source / detector indices (host-side, once)
        from scipy.spatial import cKDTree as _KD

        tree = _KD(grid.points)
        self._srcs = []
        for src in sources:
            _, node = tree.query(np.asarray(src.position)[None, :], k=1)
            for cname in src.components:
                self._srcs.append((int(node[0]), self.model.comp(cname), src))
        self._det_idx = None
        if detector_points is not None:
            _, nodes = tree.query(np.asarray(detector_points), k=1)
            self._det_idx = jnp.asarray(np.asarray(nodes, np.int32))

    def run(self, nsteps: int) -> SimplexRunResult:
        model, mat, tables, border = (
            self.model, self.mat, self.tables, self.border_kind
        )
        axes_fwd = tuple(range(model.dim))
        npairs = nsteps // 2

        times = (np.arange(nsteps, dtype=np.float64) + 1.0) * self.dt
        amps = (np.stack([np.broadcast_to(s.wavelet(times) * self.dt, nsteps)
                          for _, _, s in self._srcs], axis=1)
                if self._srcs else np.zeros((nsteps, 0)))
        amps_pairs = jnp.asarray(amps[:npairs * 2].reshape(npairs, 2, -1),
                                 dtype=self.dtype)
        det = self._det_idx

        def half_step(u, amp, axes):
            u = simplex_step(model, u, mat, tables, border, axes)
            for k, (node, comp, _) in enumerate(self._srcs):
                u = u.at[comp, node].add(amp[k])
            tr = (u[:, det].T if det is not None
                  else jnp.zeros((0, model.ncomp), u.dtype))
            return u, tr

        @partial(jax.jit, donate_argnums=0)
        def scan_all(u, amps_pairs):
            # symmetrized stage order (second order in time, SURVEY §0.3 —
            # measured in tests/test_temporal_order.py), same as Engine
            def body(u, amp2):
                u, t0_ = half_step(u, amp2[0], axes_fwd)
                u, t1_ = half_step(u, amp2[1], axes_fwd[::-1])
                return u, jnp.stack([t0_, t1_])

            return jax.lax.scan(body, u, amps_pairs)

        t0 = _time.perf_counter()
        u, traces = scan_all(self.u, amps_pairs)
        tail = []
        if nsteps % 2:
            u, tr = half_step(u, jnp.asarray(amps[-1], dtype=self.dtype),
                              axes_fwd)
            tail.append(tr)
        u.block_until_ready()
        wall = _time.perf_counter() - t0
        self.u = u
        trace_arr = None
        if det is not None:
            npts = len(np.asarray(det))
            trace_arr = np.asarray(traces).reshape(-1, npts, model.ncomp)
            if tail:
                trace_arr = np.concatenate(
                    [trace_arr, np.asarray(tail[0])[None]], axis=0)
        return SimplexRunResult(
            u=np.asarray(jax.device_get(u)),
            nsteps=nsteps,
            dt=self.dt,
            wall_seconds=wall,
            points_per_second=self.grid.npoints * nsteps / max(wall, 1e-12),
            traces=trace_arr,
        )

    def write_snapshot(self, path: str) -> None:
        from gcm_tpu.snapshot.vtk import write_vtu

        u = np.asarray(jax.device_get(self.u))
        fields = {n: u[i] for i, n in enumerate(self.model.comp_names)}
        fields["velocity"] = u[self.model.vel_slice]
        write_vtu(path, self.grid.points, self.grid.cells, fields)


# ------------------------------------------------------------ multi-body

@dataclasses.dataclass
class SimplexBody:
    """One body of a multi-body simplex scenario."""

    grid: SimplexGrid
    material: "IsotropicMaterial | OrthotropicMaterial"
    border_kind: "str | object" = "absorbing"
    borders: Optional[Sequence[Tuple[object, object]]] = None  # per-area
    u0: Optional[np.ndarray] = None


class SimplexMultiEngine:
    """Several simplex bodies coupled by node-paired contacts — the
    unstructured counterpart of MultiBodyEngine (reference contact between
    arbitrary meshes, SURVEY.md §2 component 11).

    Contacts (solver.simplex_contact) couple collocated hull nodes along a
    contact axis; bonded/slip/friction/fracture all supported. dt is the
    global CFL minimum over bodies (the reference's allreduce-min, static
    here).
    """

    def __init__(
        self,
        bodies: Dict[str, SimplexBody],
        contacts: Sequence["SimplexContactSpec"],
        model_name: str = "elastic2d",
        cfl: float = 0.8,
        dtype=jnp.float32,
    ):
        from scipy.spatial import cKDTree

        from gcm_tpu.solver.simplex_contact import pair_contact_nodes

        self.bodies = bodies
        self.contacts = tuple(contacts)
        self.model = get_model(model_name)
        self.dtype = dtype

        self.mats: Dict[str, object] = {}
        self.tables: Dict[str, dict] = {}
        self.borders: Dict[str, object] = {}
        self.us: Dict[str, jnp.ndarray] = {}

        dts = []
        for name, b in bodies.items():
            mat = _material_fields(b.material, b.grid.npoints, dtype)
            self.mats[name] = mat
            d, _ = cKDTree(b.grid.points).query(b.grid.points, k=2)
            dts.append(cfl * float(d[:, 1].min()) / mat.max_cp())
        self.dt = float(min(dts))

        for name, b in bodies.items():
            mat = self.mats[name]
            self.tables[name] = _foot_tables(b.grid, self.model, mat, self.dt)
            if b.borders is not None:
                from gcm_tpu.solver.simplex_gcm import build_node_borders
                from gcm_tpu.task import BorderSpec

                default = (BorderSpec(b.border_kind)
                           if isinstance(b.border_kind, str)
                           else b.border_kind)
                self.borders[name] = build_node_borders(
                    b.grid, b.borders, default)
            else:
                self.borders[name] = b.border_kind
            self.us[name] = jnp.asarray(
                b.u0 if b.u0 is not None
                else np.zeros((self.model.ncomp, b.grid.npoints)),
                dtype=dtype)

        # node pairing + bond masks per contact
        self._pairs: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self.bonded: Dict[int, jnp.ndarray] = {}
        for ci, c in enumerate(self.contacts):
            ia, ib = pair_contact_nodes(bodies[c.body_a].grid,
                                        bodies[c.body_b].grid)
            self._pairs[ci] = (jnp.asarray(ia), jnp.asarray(ib))
            if c.tensile_strength is not None:
                self.bonded[ci] = jnp.ones((len(ia),), dtype=dtype)

    def _one_step(self, us, bonded, parity: int):
        from gcm_tpu.solver.simplex_contact import apply_simplex_contact_post
        from gcm_tpu.solver.simplex_gcm import simplex_stage

        model = self.model
        axes = tuple(range(model.dim))
        if parity == 1:
            axes = axes[::-1]
        for axis in axes:
            olds = us
            us = {name: simplex_stage(model, u, self.mats[name],
                                      self.tables[name], axis,
                                      self.borders[name])
                  for name, u in us.items()}
            bonded = dict(bonded)
            for ci, c in enumerate(self.contacts):
                if c.axis != axis:
                    continue
                va = self.mats[c.body_a].axis_view(axis, model.stage(axis))
                vb = self.mats[c.body_b].axis_view(axis, model.stage(axis))
                ia, ib = self._pairs[ci]
                ua, ub, nb = apply_simplex_contact_post(
                    c, model, olds[c.body_a], us[c.body_a],
                    olds[c.body_b], us[c.body_b], va, vb, ia, ib,
                    bonded.get(ci))
                us[c.body_a], us[c.body_b] = ua, ub
                if nb is not None:
                    bonded[ci] = nb
        return us, bonded

    def run(self, nsteps: int):
        npairs = nsteps // 2

        @partial(jax.jit, donate_argnums=0)
        def scan_all(carry):
            def body(carry, _):
                us, bonded = carry
                us, bonded = self._one_step(us, bonded, 0)
                us, bonded = self._one_step(us, bonded, 1)
                return (us, bonded), ()

            return jax.lax.scan(body, carry, None, length=npairs)[0]

        t0 = _time.perf_counter()
        us, bonded = scan_all((self.us, self.bonded))
        if nsteps % 2:
            # un-paired forward tail step — run(3) executes 3 steps, same
            # convention as SimplexEngine/Engine (advisor r2)
            us, bonded = self._one_step(us, bonded, 0)
        jax.tree.map(lambda a: a.block_until_ready(), us)
        wall = _time.perf_counter() - t0
        self.us, self.bonded = us, bonded
        npts = sum(b.grid.npoints for b in self.bodies.values())
        return SimplexMultiRunResult(
            bodies={k: np.asarray(jax.device_get(v)) for k, v in us.items()},
            bonded={k: np.asarray(jax.device_get(v))
                    for k, v in bonded.items()},
            nsteps=nsteps, dt=self.dt, wall_seconds=wall,
            points_per_second=npts * nsteps / max(wall, 1e-12))


@dataclasses.dataclass
class SimplexMultiRunResult:
    bodies: Dict[str, np.ndarray]
    bonded: Dict[int, np.ndarray]
    nsteps: int
    dt: float
    wall_seconds: float
    points_per_second: float


def _material_fields(material, npoints: int, dtype):
    ones = np.ones(npoints)
    if isinstance(material, OrthotropicMaterial):
        return OrthotropicMaterialFields.from_constants(
            material.rho * ones,
            {k: v * ones for k, v in material.constants().items()},
            xp=jnp, dtype=dtype)
    return MaterialFields.from_arrays(
        material.rho * ones, material.lam * ones, material.mu * ones,
        xp=jnp, dtype=dtype)


def _foot_tables(grid: SimplexGrid, model, mat, dt: float):
    if isinstance(mat, MaterialFields):
        waves = {"p": np.asarray(mat.cp)}
        if float(np.asarray(mat.cs).max()) > 0:
            waves["s"] = np.asarray(mat.cs)
        return build_foot_tables(grid, waves, dt)
    return build_foot_tables_for_model(grid, model, mat, dt)
