"""Fused compressed-stencil simplex sweeps vs the jnp semantics of record.

The fused kernel (gcm_tpu.ops.pallas_simplex) must reproduce
solver.simplex_gcm.simplex_stage exactly — same weighted-roll stencils,
same outside-foot border algebra (uniform kinds AND per-node
NodeBorders), same pair/zero characteristic combine — while touching the
state once per sweep instead of |D| times.  Interpreter mode on CPU;
bench.py exercises the Mosaic-compiled path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.grids.simplex import (
    SimplexGrid, build_foot_tables, compress_foot_tables,
)
from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.ops.pallas_simplex import (
    build_fused_simplex_plan, fused_simplex_step,
)
from gcm_tpu.solver.simplex_gcm import simplex_stage
from gcm_tpu.task import BorderSpec


def _mesh_problem(rng, n=8, dim=3, model_name="elastic3d", fluid=False):
    lo, hi = (0.0,) * dim, (1.0,) * dim
    grid = SimplexGrid.box(lo, hi, (n,) * dim, jitter=0.1)
    N = grid.npoints
    model = get_model(model_name)
    rho = 2500.0 * (1.0 + 0.2 * rng.random(N))
    mu = np.zeros(N) if fluid else 1e9 * (0.5 + rng.random(N))
    lam = 1e9 * (1.0 + rng.random(N))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp,
                                     dtype=jnp.float64)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(grid.points).query(grid.points, k=2)
    dt = 0.7 * float(d[:, 1].min()) / float(np.asarray(mat.cp).max())
    waves = {"p": np.asarray(mat.cp)}
    if not fluid:
        waves["s"] = np.asarray(mat.cs)
    tables = compress_foot_tables(
        build_foot_tables(grid, waves, dt, order=1))
    assert all(t.stencil is not None for t in tables.values())
    u0 = rng.standard_normal((model.ncomp, N))
    u0[model.dim:] *= 1e6
    return grid, model, mat, tables, jnp.asarray(u0)


def _compare(model, got, want, tol=1e-12):
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < tol, f"per-comp normalized err {err}"


@pytest.mark.parametrize("border", [
    "absorbing", "free",
    BorderSpec("fixed_force", value=(1e5, -2e5, 3e5)),
    BorderSpec("fixed_velocity", value=(0.1, 0.2, -0.3)),
])
def test_fused_sweep_matches_jnp_borders(rng, border):
    grid, model, mat, tables, u0 = _mesh_problem(rng)
    want = u0
    for axes in ((0, 1, 2), (2, 1, 0)):
        for a in axes:
            want = simplex_stage(model, want, mat, tables, a, border)
    plan = build_fused_simplex_plan(model, mat, tables, border,
                                    dtype=jnp.float64)
    assert plan is not None
    u3 = plan.pad(u0)
    for axes in ((0, 1, 2), (2, 1, 0)):
        u3 = fused_simplex_step(plan, u3, axes, interpret=True)
    _compare(model, plan.unpad(u3), want)


def test_fused_sweep_node_borders(rng):
    """Per-node BCs by area: free top, fixed_force on one side, absorbing
    elsewhere — the config-4 geometry on an unstructured body."""
    from gcm_tpu.solver.simplex_gcm import build_node_borders
    from gcm_tpu.task import AreaLayer

    grid, model, mat, tables, u0 = _mesh_problem(rng)
    nb = build_node_borders(
        grid,
        [(AreaLayer(axis=2, lo=0.99, hi=1.01), BorderSpec("free")),
         (AreaLayer(axis=0, lo=-0.01, hi=0.01),
          BorderSpec("fixed_force", value=(2e5, 1e5, -1e5)))],
        default=BorderSpec("absorbing"))
    want = u0
    for a in (0, 1, 2):
        want = simplex_stage(model, want, mat, tables, a, nb)
    plan = build_fused_simplex_plan(model, mat, tables, nb,
                                    dtype=jnp.float64)
    assert plan is not None
    got = plan.unpad(fused_simplex_step(plan, plan.pad(u0),
                                        interpret=True))
    _compare(model, got, want)


def test_fused_sweep_fluid_limit(rng):
    """mu == 0: S tables absent, S pairs keep their old velocity (z=0
    branch) — the acoustic limit of the elastic model."""
    grid, model, mat, tables, u0 = _mesh_problem(rng, fluid=True)
    want = u0
    for a in (0, 1, 2):
        want = simplex_stage(model, want, mat, tables, a, "absorbing")
    plan = build_fused_simplex_plan(model, mat, tables, "absorbing",
                                    dtype=jnp.float64)
    assert plan is not None
    got = plan.unpad(fused_simplex_step(plan, plan.pad(u0),
                                        interpret=True))
    _compare(model, got, want)


def test_fused_sweep_2d(rng):
    grid, model, mat, tables, u0 = _mesh_problem(rng, n=12, dim=2,
                                                 model_name="elastic2d")
    want = u0
    for axes in ((0, 1), (1, 0)):
        for a in axes:
            want = simplex_stage(model, want, mat, tables, a, "free")
    plan = build_fused_simplex_plan(model, mat, tables, "free",
                                    dtype=jnp.float64)
    assert plan is not None
    u3 = plan.pad(u0)
    for axes in ((0, 1), (1, 0)):
        u3 = fused_simplex_step(plan, u3, axes, interpret=True)
    _compare(model, plan.unpad(u3), want)


def test_fused_plan_fallbacks(rng):
    """Configurations the plan cannot serve return None (callers fall
    back to the jnp sweep): uncompressed tables, orthotropic media."""
    import dataclasses

    from gcm_tpu.materials import (
        IsotropicMaterial, OrthotropicMaterial, OrthotropicMaterialFields,
    )

    grid, model, mat, tables, u0 = _mesh_problem(rng)
    # strip one table's stencil -> not fully compressed
    broken = dict(tables)
    k0 = next(iter(broken))
    broken[k0] = dataclasses.replace(broken[k0], stencil=None)
    assert build_fused_simplex_plan(model, mat, broken, "free") is None
    # orthotropic media keep the per-pair jnp path
    om = OrthotropicMaterial.from_isotropic(
        IsotropicMaterial.from_speeds(2500.0, 4000.0, 2300.0))
    N = grid.npoints
    omf = OrthotropicMaterialFields.from_constants(
        om.rho * np.ones(N),
        {k: v * np.ones(N) for k, v in om.constants().items()},
        xp=jnp, dtype=jnp.float64)
    assert build_fused_simplex_plan(model, omf, tables, "free") is None


def test_engine_pallas_simplex_matches_jnp(rng, monkeypatch):
    """SimplexEngine(kernel='pallas_simplex') == the jnp engine through
    the full run loop: sources, detectors, odd tails, resume layout."""
    import gcm_tpu.ops.pallas_simplex as psx
    from gcm_tpu.engine_simplex import SimplexEngine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.task import RickerSource

    orig = psx.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(psx.pl, "pallas_call", wrapped)

    g = SimplexGrid.box((0, 0, 0), (10, 10, 10), (9, 9, 9), jitter=0.1)
    rock = IsotropicMaterial.from_speeds(2500.0, 4000.0, 2300.0)
    kw = dict(
        cfl=0.6, dtype=jnp.float64,
        sources=(RickerSource((5.0, 5.0, 5.0), ("sxx", "syy", "szz"),
                              f0=800.0, t0=1.5e-3, amplitude=1e6),),
        detector_points=((5.0, 5.0, 2.0),),
        border_kind="free",
    )
    ref = SimplexEngine(g, "elastic3d", rock, kernel="jnp", **kw)
    eng = SimplexEngine(g, "elastic3d", rock, kernel="pallas_simplex",
                        **kw)
    assert eng._splan is not None
    res_r = ref.run(7)     # odd: exercises the tail half-step
    res_f = eng.run(7)
    _compare(eng.model, res_f.u, res_r.u, tol=1e-10)
    np.testing.assert_allclose(res_f.traces, res_r.traces,
                               rtol=1e-9, atol=1e-12)


def test_multi_engine_fused_matches_jnp(rng, monkeypatch):
    """SimplexMultiEngine(kernel='pallas_simplex'): fused sweeps over the
    padded flat state + unchanged contact fixups == the jnp engine,
    including fracture mask evolution (VERDICT r4 next #8)."""
    import gcm_tpu.ops.pallas_simplex as psx
    from gcm_tpu.engine_simplex import SimplexBody, SimplexMultiEngine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.simplex_contact import SimplexContactSpec

    orig = psx.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(psx.pl, "pallas_call", wrapped)

    rock = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)
    L, n, k = 8.0, 9, 4
    xk = k * L / (n - 1)
    g_a = SimplexGrid.box((0, 0), (xk, L), (k + 1, n))
    g_b = SimplexGrid.box((xk, 0), (L, L), (n - k, n))

    def u0_of(g):
        u = 0.1 * np.sin(g.points[:, 0]) * np.cos(g.points[:, 1])
        out = np.zeros((5, g.npoints))
        out[2] = 1e5 * u
        out[4] = 1e5 * u
        return out

    bodies = {
        "a": SimplexBody(g_a, rock, u0=u0_of(g_a)),
        "b": SimplexBody(g_b, rock, u0=u0_of(g_b)),
    }
    contacts = [SimplexContactSpec("a", "b", axis=0, kind="bonded",
                                   tensile_strength=2e4)]
    ref = SimplexMultiEngine(bodies, contacts, model_name="elastic2d",
                             cfl=0.6, dtype=jnp.float64, kernel="jnp")
    eng = SimplexMultiEngine(bodies, contacts, model_name="elastic2d",
                             cfl=0.6, dtype=jnp.float64,
                             kernel="pallas_simplex")
    assert eng._splans is not None
    res_r = ref.run(5)      # odd: exercises the tail step on padded state
    res_f = eng.run(5)
    for name in res_r.bodies:
        w = res_r.bodies[name]
        scale = np.abs(w).max() + 1e-30
        assert np.abs(res_f.bodies[name] - w).max() / scale < 1e-10
        assert res_f.bodies[name].shape == w.shape
    for ci in res_r.bonded:
        np.testing.assert_array_equal(res_f.bonded[ci], res_r.bonded[ci])


def test_fused_sweep_order2(rng):
    """Order-2 MLS tables (wider delta sets, larger halos) through the
    fused kernel == the jnp sweep."""
    grid = SimplexGrid.box((0, 0, 0), (1.0,) * 3, (8,) * 3, jitter=0.1)
    N = grid.npoints
    model = get_model("elastic3d")
    rho = 2500.0 * (1.0 + 0.2 * rng.random(N))
    mat = MaterialFields.from_arrays(rho, 1e9 * np.ones(N),
                                     5e8 * np.ones(N), xp=jnp,
                                     dtype=jnp.float64)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(grid.points).query(grid.points, k=2)
    dt = 0.7 * float(d[:, 1].min()) / float(np.asarray(mat.cp).max())
    tables = compress_foot_tables(build_foot_tables(
        grid, {"p": np.asarray(mat.cp), "s": np.asarray(mat.cs)}, dt,
        order=2))
    assert all(t.stencil is not None for t in tables.values())
    u0 = rng.standard_normal((9, N))
    u0[3:] *= 1e6
    u0 = jnp.asarray(u0)
    want = u0
    for a in (0, 1, 2):
        want = simplex_stage(model, want, mat, tables, a, "free")
    plan = build_fused_simplex_plan(model, mat, tables, "free",
                                    dtype=jnp.float64)
    assert plan is not None
    got = plan.unpad(fused_simplex_step(plan, plan.pad(u0),
                                        interpret=True))
    _compare(model, got, want)
