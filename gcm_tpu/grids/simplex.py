"""Simplex (tri/tet) meshes with precomputed characteristic gather tables.

TPU-native counterpart of the reference's CGAL-backed ``SimplexGrid`` +
simplex GCM stage (SURVEY.md §2 components 5 and 9; BASELINE config 5
"gather-based characteristic interpolation on unstructured grid").

The key TPU transform (SURVEY.md §7 "Simplex gathers"): point location is
data-dependent and TPU-hostile, but with static dt and static materials the
characteristic foot of every (node, axis, wave, direction) is *fixed for
the whole run*. So the containing cells and barycentric weights are
precomputed host-side (scipy Delaunay ``find_simplex`` — the CGAL-walk
equivalent; a C++ fast path lives in gcm_tpu/native), and each sweep is a
static ``jnp.take`` gather + weighted sum over node arrays.

Feet that fall outside the hull mark *incoming* invariants at the border;
the simplex solver overwrites those from the border condition
(absorbing/free), which is the unstructured analogue of the boundary-slab
corrections on cubic grids.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class SimplexGrid:
    """An unstructured simplex mesh: points [N, dim], cells [M, dim+1]."""

    points: np.ndarray
    cells: np.ndarray
    delaunay: Optional[object] = None     # scipy.spatial.Delaunay if built

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    @property
    def npoints(self) -> int:
        return self.points.shape[0]

    @staticmethod
    def from_points(points: np.ndarray) -> "SimplexGrid":
        from scipy.spatial import Delaunay

        points = np.asarray(points, np.float64)
        tri = Delaunay(points)
        return SimplexGrid(points=points, cells=tri.simplices.copy(),
                           delaunay=tri)

    @staticmethod
    def box(lo: Sequence[float], hi: Sequence[float], n: Sequence[int],
            jitter: float = 0.0, seed: int = 0) -> "SimplexGrid":
        """Triangulated box: structured node lattice (optionally jittered in
        the interior) — the standard way to build a conforming test mesh."""
        axes = [np.linspace(l, h, k) for l, h, k in zip(lo, hi, n)]
        pts = np.stack([g.ravel() for g in np.meshgrid(*axes, indexing="ij")],
                       axis=-1)
        if jitter > 0:
            rng = np.random.default_rng(seed)
            steps = [(h - l) / (k - 1) for l, h, k in zip(lo, hi, n)]
            interior = np.ones(len(pts), bool)
            for a, (l, h) in enumerate(zip(lo, hi)):
                interior &= (pts[:, a] > l + 1e-9) & (pts[:, a] < h - 1e-9)
            pts[interior] += (rng.uniform(-jitter, jitter,
                                          (interior.sum(), len(lo)))
                              * np.asarray(steps))
        return SimplexGrid.from_points(pts)

    def hull_mask(self) -> np.ndarray:
        """Boolean mask of border (convex-hull) nodes."""
        from scipy.spatial import ConvexHull

        m = np.zeros(self.npoints, bool)
        m[np.unique(ConvexHull(self.points).simplices)] = True
        return m


@dataclasses.dataclass
class FootTables:
    """Gather tables for one (axis, wave, direction):

    - ``ids``     [N, dim+1] int32 vertex indices of the containing cell
                  (self-index where the foot is outside the hull)
    - ``weights`` [N, dim+1] float32 barycentric weights (0 where outside)
    - ``outside`` [N] bool — foot fell outside (incoming invariant at border)
    """

    ids: np.ndarray
    weights: np.ndarray
    outside: np.ndarray


def _locate_feet(grid: SimplexGrid, tri, starts, c: np.ndarray,
                 axis: int, direction: int, dt: float) -> FootTables:
    """Locate + barycentric-weight the feet ``x + direction*c*dt*e_axis``."""
    from gcm_tpu import native

    N, dim = grid.npoints, grid.dim
    self_ids = np.arange(N, dtype=np.int32)
    feet = grid.points.copy()
    feet[:, axis] += direction * c * dt
    # native C++ visibility walk (scipy fallback inside)
    cells, weights = native.walk_locate(tri, feet, starts)
    outside = cells < 0
    cc = np.where(outside, 0, cells)
    verts = tri.simplices[cc]                        # [N, dim+1]
    # Sliver cells (degenerate Delaunay simplices) can yield
    # weights slightly outside [0,1] or non-finite transforms;
    # clamp + renormalize so every interpolation is a convex
    # combination — the scheme is then L-inf stable per sweep.
    weights = np.where(np.isfinite(weights), weights, 0.0)
    weights = np.clip(weights, 0.0, 1.0)
    wsum = weights.sum(axis=1, keepdims=True)
    degenerate = wsum[:, 0] <= 1e-12
    if degenerate.any():
        # fall back to the cell vertex nearest to the foot
        dcell = np.linalg.norm(
            grid.points[verts] - feet[:, None, :], axis=2)
        nearest = np.argmin(dcell, axis=1)
        onehot = np.eye(dim + 1)[nearest]
        weights = np.where(degenerate[:, None], onehot, weights)
        wsum = weights.sum(axis=1, keepdims=True)
    weights = weights / wsum
    ids = np.where(outside[:, None], self_ids[:, None], verts)
    weights = np.where(outside[:, None], 0.0, weights)
    return FootTables(
        ids=ids.astype(np.int32),
        # float64: the pair transform multiplies weights by the
        # impedance (~1e6-1e7), amplifying rounding — cast to the
        # compute dtype only at use (solver.simplex_gcm)
        weights=weights,
        outside=outside,
    )


def _walk_context(grid: SimplexGrid):
    tri = grid.delaunay
    if tri is None:
        from scipy.spatial import Delaunay

        tri = Delaunay(grid.points)
    # each node's own incident cell: O(1) walk starts (CGAL-style)
    starts = tri.vertex_to_simplex.astype(np.int32)
    return tri, starts


def build_foot_tables(
    grid: SimplexGrid,
    speeds: Dict[str, np.ndarray],     # wave -> per-node speed [N]
    dt: float,
    waves: Sequence[str] = ("p", "s"),
) -> Dict[Tuple[int, str, int], FootTables]:
    """Precompute containing-cell + barycentric tables for every
    (axis, wave, direction): foot = x + direction * c * dt * e_axis.

    Note the sign convention: the invariant riding speed −c has its foot at
    ``x + c dt e_a`` (direction +1); speed +c at direction −1 — identical to
    gcm_tpu.ops.interp.
    """
    tri, starts = _walk_context(grid)
    out: Dict[Tuple[int, str, int], FootTables] = {}
    for a in range(grid.dim):
        for w in waves:
            if w not in speeds:
                continue
            c = np.asarray(speeds[w], np.float64)
            if not np.any(c > 0):
                continue
            for direction in (+1, -1):
                out[(a, w, direction)] = _locate_feet(
                    grid, tri, starts, c, a, direction, dt)
    return out


def build_foot_tables_for_model(
    grid: SimplexGrid, model, mat, dt: float
) -> Dict[Tuple[int, int, int], FootTables]:
    """Per-pair foot tables keyed ``(axis, pair_index, direction)``.

    Speeds come from the material's ``axis_view`` — isotropic media reduce
    to the per-wave tables of :func:`build_foot_tables`, anisotropic
    (orthotropic) media get genuinely per-pair feet (e.g. the two shear
    pairs of a 3D sweep ride different speeds, c55 vs c66).
    """
    tri, starts = _walk_context(grid)
    out: Dict[Tuple[int, int, int], FootTables] = {}
    for a in range(grid.dim):
        view = mat.axis_view(a, model.stage(a))
        for k, c in enumerate(view.pair_c):
            c = np.asarray(c, np.float64)
            if not np.any(c > 0):
                continue
            for direction in (+1, -1):
                out[(a, k, direction)] = _locate_feet(
                    grid, tri, starts, c, a, direction, dt)
    return out
