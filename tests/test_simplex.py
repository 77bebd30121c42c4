"""Simplex-mesh GCM tests (BASELINE config 5, SURVEY.md §3.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.grids.simplex import SimplexGrid, build_foot_tables
from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.simplex_gcm import simplex_step


def _mat_fields(npts, mat):
    ones = np.ones(npts)
    return MaterialFields.from_arrays(
        mat.rho * ones, mat.lam * ones, mat.mu * ones, xp=jnp, dtype=jnp.float64
    )


def test_tables_partition_of_unity():
    g = SimplexGrid.box((0, 0), (10, 10), (11, 11), jitter=0.2)
    c = 1.0 * np.ones(g.npoints)
    tabs = build_foot_tables(g, {"p": c}, dt=0.3, waves=("p",))
    for t in tabs.values():
        inside = ~t.outside
        np.testing.assert_allclose(t.weights[inside].sum(1), 1.0, atol=1e-9)
        assert (t.weights[inside] > -1e-9).all()  # feet inside their cells
        assert t.weights[t.outside].sum() == 0


def test_uniform_state_stays_uniform():
    """Constant fields are exactly preserved in the interior (weights sum 1)."""
    g = SimplexGrid.box((0, 0), (8, 8), (9, 9), jitter=0.25)
    water = IsotropicMaterial.from_speeds(1000.0, 1500.0)
    mat = _mat_fields(g.npoints, water)
    model = get_model("acoustic2d")
    tabs = build_foot_tables(g, {"p": np.asarray(mat.cp)}, dt=0.3 / 1500.0,
                             waves=("p",))
    u = jnp.ones((model.ncomp, g.npoints), dtype=jnp.float64)
    out = np.asarray(simplex_step(model, u, mat, tabs))
    # absorbing BCs perturb hull nodes; within one step their influence
    # reaches <= ~2 cells, so check the deep interior only
    pts = g.points
    deep = ((pts > 2.5) & (pts < 5.5)).all(axis=1)
    assert deep.any()
    np.testing.assert_allclose(out[:, deep], 1.0, atol=1e-12)


def test_plane_wave_speed_simplex_2d():
    """A right-going acoustic pulse travels at c along x-sweeps; on a
    regular triangulated lattice the x-sweep interpolation degenerates to
    the structured order-1 stencil (feet land on lattice edges)."""
    L, W = 100.0, 6.0
    nx, ny = 201, 13
    g = SimplexGrid.box((0, 0), (L, W), (nx, ny), jitter=0.15)
    water = IsotropicMaterial.from_speeds(1000.0, 1500.0)
    mat = _mat_fields(g.npoints, water)
    model = get_model("acoustic2d")
    c, z = 1500.0, 1000.0 * 1500.0
    hx = L / (nx - 1)
    dt = 0.5 * hx / c
    tabs = build_foot_tables(g, {"p": np.asarray(mat.cp)}, dt, waves=("p",))

    x = g.points[:, 0]
    prof = np.exp(-((x - 30.0) ** 2) / (2 * 4.0**2))
    u0 = np.zeros((model.ncomp, g.npoints))
    u0[model.comp("p")] = prof
    u0[model.comp("vx")] = prof / z  # right-going: w_R = p + z v
    u = jnp.asarray(u0)
    nsteps = 80
    for _ in range(nsteps):
        u = simplex_step(model, u, mat, tabs, axes=(0,))
    p = np.asarray(u[model.comp("p")])
    x_peak = x[np.argmax(p)]
    expect = 30.0 + c * nsteps * dt
    assert abs(x_peak - expect) < 2 * hx
    assert p.max() > 0.8  # order-1 dissipation only


def test_simplex_matches_structured_order1():
    """Radial acoustic pulse: simplex GCM on a regular triangulated lattice
    vs the structured solver at order 1 on the same nodes — the BASELINE
    config-5 cross-check (cubic-vs-simplex, SURVEY.md §4)."""
    from gcm_tpu.solver.gcm import step as structured_step
    from gcm_tpu.task import BorderSpec

    n = 41
    L = 40.0
    h = L / (n - 1)
    g = SimplexGrid.box((0, 0), (L, L), (n, n), jitter=0.0)
    water = IsotropicMaterial.from_speeds(1000.0, 1500.0)
    mat_s = _mat_fields(g.npoints, water)
    model = get_model("acoustic2d")
    dt = 0.5 * h / 1500.0
    tabs = build_foot_tables(g, {"p": np.asarray(mat_s.cp)}, dt, waves=("p",))

    xy = g.points
    r2 = ((xy - L / 2) ** 2).sum(1)
    prof = np.exp(-r2 / (2 * 3.0**2))
    u0 = np.zeros((model.ncomp, g.npoints))
    u0[model.comp("p")] = prof
    u_simp = jnp.asarray(u0)

    # same problem on the structured grid (nodes coincide: box lattice)
    mat_c = MaterialFields.uniform(water, (n, n), xp=jnp, dtype=jnp.float64)
    uc = np.zeros((model.ncomp, n, n))
    uc[model.comp("p")] = prof.reshape(n, n)
    u_struct = jnp.asarray(uc)
    borders = {(a, s): BorderSpec("absorbing") for a in (0, 1) for s in (0, 1)}

    for _ in range(20):
        u_simp = simplex_step(model, u_simp, mat_s, tabs)
        u_struct = structured_step(model, u_struct, mat_c, dt, (h, h), 1,
                                   borders)
    ps = np.asarray(u_simp[model.comp("p")]).reshape(n, n)
    pc = np.asarray(u_struct[model.comp("p")])
    # same wavefront to within the schemes' different cross-terms
    err = np.abs(ps - pc).max() / np.abs(pc).max()
    assert err < 0.2, f"simplex vs structured relative err {err}"
    # wavefront radius: peak of radial profile at ~c*t
    mid = n // 2
    ray = ps[mid, mid:]
    r_peak = np.argmax(ray) * h
    assert abs(r_peak - 1500.0 * 20 * dt) <= 2 * h


def test_elastic3d_simplex_stable_and_decaying():
    """Random consistent state on a jittered tet mesh: convex-combination
    interpolation must keep every invariant bounded (L-inf stable)."""
    g = SimplexGrid.box((0, 0, 0), (10, 10, 10), (7, 7, 7), jitter=0.1)
    rock = IsotropicMaterial.from_speeds(2500.0, 4000.0, 2300.0)
    mat = _mat_fields(g.npoints, rock)
    model = get_model("elastic3d")
    dt = 0.5 * (10 / 6) / 4000.0
    tabs = build_foot_tables(
        g, {"p": np.asarray(mat.cp), "s": np.asarray(mat.cs)}, dt)
    rng = np.random.default_rng(0)
    z = float(np.asarray(mat.zp)[0])
    u0 = rng.standard_normal((model.ncomp, g.npoints))
    u0[:3] /= z  # physically consistent: v ~ sigma / z
    u = jnp.asarray(u0)
    m0 = float(jnp.abs(u).max())
    for _ in range(20):
        u = simplex_step(model, u, mat, tabs)
    out = np.asarray(u)
    assert np.isfinite(out).all()
    # absorbing hull + dissipative interior => bounded by ~initial envelope
    assert np.abs(out[3:]).max() < 4.0 * m0
    assert np.abs(out[:3]).max() < 4.0 * m0 / z * 10


def test_simplex_orthotropic_isotropic_limit():
    """Orthotropic fields with isotropic constants through the per-pair
    tables reproduce the isotropic simplex run exactly."""
    from gcm_tpu.grids.simplex import build_foot_tables_for_model
    from gcm_tpu.materials import OrthotropicMaterial, OrthotropicMaterialFields

    g = SimplexGrid.box((0, 0), (12, 12), (13, 13), jitter=0.2)
    iso = IsotropicMaterial.from_speeds(1200.0, 2000.0, 1000.0)
    mat = _mat_fields(g.npoints, iso)
    model = get_model("elastic2d")
    dt = 0.3 * 1.0 / iso.cp
    tabs = build_foot_tables(
        g, {"p": np.asarray(mat.cp), "s": np.asarray(mat.cs)}, dt)

    om = OrthotropicMaterial.from_isotropic(iso)
    ones = np.ones(g.npoints)
    omat = OrthotropicMaterialFields.from_constants(
        om.rho * ones, {k: v * ones for k, v in om.constants().items()},
        xp=jnp, dtype=jnp.float64)
    otabs = build_foot_tables_for_model(g, model, omat, dt)
    assert set(otabs) == {(a, k, d) for a in (0, 1) for k in (0, 1)
                          for d in (+1, -1)}

    rng = np.random.default_rng(3)
    u0 = rng.standard_normal((model.ncomp, g.npoints))
    u_iso = jnp.asarray(u0)
    u_ort = jnp.asarray(u0)
    for _ in range(3):
        u_iso = simplex_step(model, u_iso, mat, tabs)
        u_ort = simplex_step(model, u_ort, omat, otabs)
    np.testing.assert_allclose(np.asarray(u_ort), np.asarray(u_iso),
                               rtol=1e-12, atol=1e-12)


def test_simplex_engine_orthotropic_anisotropy():
    """SimplexEngine with an orthotropic material: the P front moves faster
    along the stiffer axis."""
    from gcm_tpu.engine_simplex import SimplexEngine
    from gcm_tpu.materials import OrthotropicMaterial

    om = OrthotropicMaterial(rho=1500.0, c11=12.0e9, c12=2.0e9, c13=2.0e9,
                             c22=4.0e9, c23=1.5e9, c33=5.0e9,
                             c44=1.2e9, c55=1.4e9, c66=1.6e9)
    n = 41
    g = SimplexGrid.box((0, 0), (n - 1.0, n - 1.0), (n, n), jitter=0.1)
    u0 = np.zeros((5, g.npoints))
    r2 = ((g.points - (n - 1) / 2.0) ** 2).sum(1)
    blob = np.exp(-r2 / (2 * 1.5**2))
    u0[2] = blob  # sxx
    u0[4] = blob  # syy
    eng = SimplexEngine(g, "elastic2d", om, cfl=0.6, u0=u0,
                        dtype=jnp.float64)
    res = eng.run(nsteps=14)
    v = np.sqrt(res.u[0] ** 2 + res.u[1] ** 2)
    assert np.isfinite(res.u).all()
    c = (n - 1) / 2.0
    th = 0.05 * v.max()
    lit = g.points[v > th]
    reach_x = np.abs(lit[:, 0] - c).max()
    reach_y = np.abs(lit[:, 1] - c).max()
    assert reach_x > 1.25 * reach_y, (reach_x, reach_y)


def test_simplex_border_fixed_force_zero_equals_free():
    """BorderSpec('fixed_force', 0) on the hull == 'free' exactly."""
    from gcm_tpu.task import BorderSpec

    g = SimplexGrid.box((0, 0), (12, 12), (13, 13), jitter=0.2)
    iso = IsotropicMaterial.from_speeds(1000.0, 1500.0)
    mat = _mat_fields(g.npoints, iso)
    model = get_model("acoustic2d")
    dt = 0.4 / 1500.0
    tabs = build_foot_tables(g, {"p": np.asarray(mat.cp)}, dt, waves=("p",))
    rng = np.random.default_rng(5)
    u0 = jnp.asarray(rng.standard_normal((model.ncomp, g.npoints)))
    ua, ub = u0, u0
    for _ in range(4):
        ua = simplex_step(model, ua, mat, tabs, "free")
        ub = simplex_step(model, ub, mat, tabs,
                          BorderSpec("fixed_force", 0.0))
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


def test_simplex_border_rigid_wall_reflection_sign():
    """fixed_velocity(0) (rigid wall): pressure reflects without sign flip;
    free border flips the sign — the classic acoustic wall/free dichotomy."""
    from gcm_tpu.task import BorderSpec

    L, W = 60.0, 4.0
    nx, ny = 121, 9
    g = SimplexGrid.box((0, 0), (L, W), (nx, ny))
    iso = IsotropicMaterial.from_speeds(1000.0, 1500.0)
    mat = _mat_fields(g.npoints, iso)
    model = get_model("acoustic2d")
    c, z = 1500.0, 1000.0 * 1500.0
    hx = L / (nx - 1)
    dt = 0.9 * hx / c
    tabs = build_foot_tables(g, {"p": np.asarray(mat.cp)}, dt, waves=("p",))

    # right-going pulse near the right border: p = f, vx = p/z (acoustic
    # convention: right-going wave has v = p/(rho c) with s = -1 pairs)
    prof = np.exp(-((g.points[:, 0] - 48.0) ** 2) / (2 * 2.0**2))
    u0 = np.zeros((model.ncomp, g.npoints))
    u0[model.comp("p")] = prof
    u0[model.comp("vx")] = prof / z

    def run(bc):
        u = jnp.asarray(u0)
        nst = int(round(24.0 / (c * dt)))
        for _ in range(nst):
            u = simplex_step(model, u, mat, tabs, bc, axes=(0,))
        return np.asarray(u[model.comp("p")])

    p_wall = run(BorderSpec("fixed_velocity", 0.0))
    p_free = run("free")
    # after reflection the pulse sits in the domain again
    assert p_wall.max() > 0.6          # rigid wall: positive pulse returns
    assert p_free.min() < -0.6         # free surface: sign-flipped return
    assert p_wall.min() > -0.25
    assert p_free.max() < 0.25


def test_stencil_compression_equals_gather(rng):
    """compress_foot_tables regroups the semi-Lagrangian gather by index
    delta into weighted rolls (VERDICT r3 item 3); the sweep through the
    stencil form must match the gather form to FP-regrouping tolerance on
    a jittered lattice, including hull border handling."""
    import dataclasses

    import jax.numpy as jnp

    from gcm_tpu.grids.simplex import (
        SimplexGrid, build_foot_tables, compress_foot_tables,
    )
    from gcm_tpu.materials import IsotropicMaterial, MaterialFields
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.solver.simplex_gcm import simplex_step

    n = 9
    grid = SimplexGrid.box((0, 0, 0), (1.0, 1.0, 1.0), (n, n, n),
                           jitter=0.15)
    model = get_model("elastic3d")
    mat = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    mf = MaterialFields.uniform(mat, (grid.npoints,), xp=jnp,
                                dtype=jnp.float64)
    dt = 0.8 * (1.0 / (n - 1)) / mat.cp
    tables = build_foot_tables(
        grid, {"p": np.full(grid.npoints, mat.cp),
               "s": np.full(grid.npoints, mat.cs)}, dt, order=1)
    ctables = compress_foot_tables(
        {k: dataclasses.replace(t) for k, t in tables.items()})
    assert all(t.stencil is not None for t in ctables.values()), \
        "a jittered lattice must compress"
    assert all(t.stencil is None for t in tables.values())

    u0 = jnp.asarray(rng.standard_normal((9, grid.npoints)) * 1e3)
    got, want = u0, u0
    for nstep in range(3):
        axes = (0, 1, 2) if nstep % 2 == 0 else (2, 1, 0)
        got = simplex_step(model, got, mf, ctables, "free", axes)
        want = simplex_step(model, want, mf, tables, "free", axes)
    # atol covers FP regrouping of impedance-scaled invariants (~1e10
    # magnitudes inside w = sigma + z*v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-6)
