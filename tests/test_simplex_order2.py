"""Order-2 characteristic interpolation on simplex meshes (VERDICT r2
missing #3 / item 4): least-squares quadratic reconstruction tables.

SURVEY.md §0.3 step 2 requires order-1 AND order-2 interpolation; round 2
had order 2 only on cubic grids. These tests pin (a) exactness of the MLS
weights on quadratic fields, (b) the convergence order of advection on
jittered meshes (slope ≈2 vs ≈1 for barycentric).
"""

import numpy as np
import pytest

from gcm_tpu.grids.simplex import SimplexGrid, build_foot_tables
from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.simplex_gcm import simplex_step

import jax.numpy as jnp

WATER = IsotropicMaterial.from_speeds(rho=1000.0, cp=1500.0)


def _mat(npts, mat=WATER):
    ones = np.ones(npts)
    return MaterialFields.from_arrays(
        mat.rho * ones, mat.lam * ones, mat.mu * ones,
        xp=jnp, dtype=jnp.float64)


@pytest.mark.parametrize("dim", [2, 3])
def test_order2_tables_exact_on_quadratics(dim):
    """The reconstruction weights must reproduce any degree<=2 polynomial
    exactly at interior feet (the defining property of order 2)."""
    n = 13 if dim == 2 else 9
    g = SimplexGrid.box((0.0,) * dim, (10.0,) * dim, (n,) * dim,
                        jitter=0.25, seed=4)
    c = 1.0 * np.ones(g.npoints)
    dt = 0.31
    tabs = build_foot_tables(g, {"p": c}, dt, waves=("p",), order=2)
    rng = np.random.default_rng(0)
    coeffs = rng.standard_normal((dim + 1, dim + 1))
    coeffs = coeffs + coeffs.T

    def quad(x):
        xe = np.concatenate([np.ones((len(x), 1)), x], axis=1)
        return np.einsum("ni,ij,nj->n", xe, coeffs, xe)

    f = quad(g.points)
    for (a, _, direction), t in tabs.items():
        feet = g.points.copy()
        feet[:, a] += direction * c * dt
        want = quad(feet)
        got = (f[t.ids] * t.weights).sum(axis=1)
        inside = ~t.outside
        assert inside.any()
        err = np.abs(got[inside] - want[inside]).max()
        scale = np.abs(want[inside]).max()
        assert err < 1e-8 * scale, f"axis {a} dir {direction}: {err}"


def _advect_error(n, order):
    """One-way acoustic pulse advected along x on a jittered strip; error
    vs the exact translation after a fixed physical time."""
    L, W = 100.0, 8.0
    ny = max(5, int(round((n - 1) * W / L)) + 1)
    g = SimplexGrid.box((0.0, 0.0), (L, W), (n, ny), jitter=0.22, seed=1)
    model = get_model("acoustic2d")
    mat = _mat(g.npoints)
    c, z = WATER.cp, WATER.rho * WATER.cp
    hx = L / (n - 1)
    dt = 0.43 * hx / c
    tabs = build_foot_tables(g, {"p": np.full(g.npoints, c)}, dt,
                             waves=("p",), order=order)

    x = g.points[:, 0]
    x0, sig = 25.0, 6.0

    def prof(xx):
        return np.exp(-((xx - x0) ** 2) / (2 * sig**2))

    u0 = np.zeros((model.ncomp, g.npoints))
    u0[model.comp("p")] = prof(x)
    u0[model.comp("vx")] = prof(x) / z       # right-going invariant only
    u = jnp.asarray(u0)
    T = 30.0 / c                              # travel 30 m
    nsteps = int(round(T / dt))
    for _ in range(nsteps):
        u = simplex_step(model, u, mat, tabs, axes=(0,))
    p = np.asarray(u[model.comp("p")])
    want = prof(x - c * nsteps * dt)
    interior = (x > 10.0) & (x < 90.0)
    return np.abs(p - want)[interior].max()


def test_advection_convergence_order2_vs_order1():
    """Grid-refinement slopes: barycentric ≈1, quadratic ≈2 (the done
    criterion of VERDICT r2 item 4)."""
    ns = [51, 101, 201]
    errs1 = [_advect_error(n, order=1) for n in ns]
    errs2 = [_advect_error(n, order=2) for n in ns]
    slope1 = np.polyfit(np.log([1 / (n - 1) for n in ns]),
                        np.log(errs1), 1)[0]
    slope2 = np.polyfit(np.log([1 / (n - 1) for n in ns]),
                        np.log(errs2), 1)[0]
    assert 0.6 < slope1 < 1.6, f"order-1 slope {slope1} ({errs1})"
    assert slope2 > 1.7, f"order-2 slope {slope2} ({errs2})"
    # and order 2 is actually more accurate at every resolution
    assert all(e2 < e1 for e1, e2 in zip(errs1, errs2))


def test_order2_engine_runs_and_is_stable():
    """SimplexEngine(order=2): a pulse in a closed box stays finite and
    bounded over many steps (L-inf sanity of the MLS scheme + borders)."""
    from gcm_tpu.engine_simplex import SimplexEngine

    g = SimplexGrid.box((0, 0), (20.0, 20.0), (21, 21), jitter=0.2, seed=2)
    rock = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    u0 = np.zeros((5, g.npoints))
    r2 = ((g.points - 10.0) ** 2).sum(1)
    u0[2] = u0[4] = 1e5 * np.exp(-r2 / 8.0)
    eng = SimplexEngine(g, "elastic2d", rock, u0=u0, order=2, cfl=0.5)
    res = eng.run(60)
    assert np.isfinite(res.u).all()
    assert np.abs(res.u[2]).max() < 2e5  # no blow-up


@pytest.mark.parametrize("dim", [2, 3])
def test_order3_tables_exact_on_cubics(dim):
    """order=3 reconstruction weights reproduce any degree<=3 polynomial
    exactly at interior feet."""
    n = 13 if dim == 2 else 9
    g = SimplexGrid.box((0.0,) * dim, (10.0,) * dim, (n,) * dim,
                        jitter=0.25, seed=4)
    c = 1.0 * np.ones(g.npoints)
    dt = 0.31
    tabs = build_foot_tables(g, {"p": c}, dt, waves=("p",), order=3)
    rng = np.random.default_rng(3)
    lin = rng.standard_normal(dim)

    def cubic(x):
        s = x @ lin
        return 0.3 * s**3 - 0.7 * s**2 + 1.1 * s - 0.4 \
            + (x[:, 0] ** 2) * x[:, -1]

    f = cubic(g.points)
    checked = 0
    for (a, _, direction), t in tabs.items():
        feet = g.points.copy()
        feet[:, a] += direction * c * dt
        want = cubic(feet)
        got = (f[t.ids] * t.weights).sum(axis=1)
        inside = ~t.outside
        assert inside.any()
        err = np.abs(got[inside] - want[inside]).max()
        scale = np.abs(want[inside]).max()
        assert err < 1e-7 * scale, f"axis {a} dir {direction}: {err}"
        checked += 1
    assert checked >= 2 * dim


def test_advection_order3_converges_faster():
    """order=3 converges with slope > 2.2 and overtakes order=2 by the
    finest resolution (the weighted-LSQ constant is larger at coarse h —
    the crossover is the honest behavior of scattered-node high-order
    reconstruction; see the gamma note in _mls_quadratic_weights)."""
    ns = [51, 101, 201]
    errs2 = [_advect_error(n, order=2) for n in ns]
    errs3 = [_advect_error(n, order=3) for n in ns]
    slope3 = np.polyfit(np.log([1 / (n - 1) for n in ns]),
                        np.log(errs3), 1)[0]
    assert slope3 > 2.2, f"order-3 slope {slope3} ({errs3})"
    assert errs3[-1] < errs2[-1], (errs2, errs3)


def test_order3_engine_runs_and_is_stable():
    from gcm_tpu.engine_simplex import SimplexEngine

    g = SimplexGrid.box((0, 0), (20.0, 20.0), (21, 21), jitter=0.2, seed=2)
    rock = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    u0 = np.zeros((5, g.npoints))
    r2 = ((g.points - 10.0) ** 2).sum(1)
    u0[2] = u0[4] = 1e5 * np.exp(-r2 / 8.0)
    eng = SimplexEngine(g, "elastic2d", rock, u0=u0, order=3, cfl=0.4)
    res = eng.run(60)
    assert np.isfinite(res.u).all()
    assert np.abs(res.u[2]).max() < 2e5
