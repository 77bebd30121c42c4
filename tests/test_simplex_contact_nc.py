"""Non-conforming contact between INDEPENDENTLY meshed simplex bodies.

Completes VERDICT r2 missing #4 on the unstructured side: two hulls whose
interface nodes are not collocated (h vs h/2 lattices here) couple through
static interface-interpolation maps (solver.simplex_contact
pair_contact_maps / apply_simplex_contact_nc_post). Anchors mirror the
structured tests: degenerate-conforming equality with the collocated
solve, and exactness on an affine shear field (linear maps are exact on
affine data).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from gcm_tpu.engine_simplex import SimplexBody, SimplexMultiEngine
from gcm_tpu.grids.simplex import SimplexGrid
from gcm_tpu.materials import IsotropicMaterial
from gcm_tpu.solver.simplex_contact import (
    SimplexContactSpec,
    pair_contact_maps,
)

ROCK = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)


def _mismatched_halves(L=16.0, n_a=9, n_b=17):
    """Left half meshed at h, right half at h/2 (nodes NOT collocated
    except at the corners)."""
    g_a = SimplexGrid.box((0, 0), (L / 2, L), (n_a, n_a))
    g_b = SimplexGrid.box((L / 2, 0), (L, L), (n_b, n_b))
    return g_a, g_b


def test_pair_contact_maps_mismatched_lattices():
    g_a, g_b = _mismatched_halves()
    maps = pair_contact_maps(g_a, g_b, axis=0)
    assert len(maps.idx_a) == 9 and len(maps.idx_b) == 17
    # weights are convex and exact on affine transverse data
    np.testing.assert_allclose(maps.w_a.sum(1), 1.0, atol=1e-12)
    ya = g_a.points[maps.idx_a, 1]
    yb = g_b.points[maps.idx_b, 1]
    got = (yb[maps.nbr_a] * maps.w_a).sum(1)
    np.testing.assert_allclose(got, ya, atol=1e-10)
    got_b = (ya[maps.nbr_b] * maps.w_b).sum(1)
    np.testing.assert_allclose(got_b, yb, atol=1e-10)


def test_conforming_maps_equal_collocated_solve(rng):
    """On a CONFORMING split the mapped per-side solve must reproduce the
    collocated shared solve exactly (identity tables)."""
    L, n, k = 16.0, 17, 8
    xk = k * L / (n - 1)
    g_a = SimplexGrid.box((0, 0), (xk, L), (k + 1, n))
    g_b = SimplexGrid.box((xk, 0), (L, L), (n - k, n))
    u0a = rng.standard_normal((5, g_a.npoints))
    u0b = rng.standard_normal((5, g_b.npoints))
    u0a[2:] *= 1e5
    u0b[2:] *= 1e5

    def build():
        bodies = {"a": SimplexBody(g_a, ROCK, u0=u0a.copy()),
                  "b": SimplexBody(g_b, ROCK, u0=u0b.copy())}
        return SimplexMultiEngine(
            bodies, [SimplexContactSpec("a", "b", axis=0)],
            model_name="elastic2d", cfl=0.6, dtype=jnp.float64)

    ref = build()
    assert 0 in ref._pairs            # collocated path auto-selected
    res_ref = ref.run(4)

    forced = build()
    forced._pairs.clear()
    forced._ncmaps[0] = pair_contact_maps(g_a, g_b, axis=0)
    res = forced.run(4)
    for name in ("a", "b"):
        np.testing.assert_allclose(
            np.asarray(res.bodies[name]), np.asarray(res_ref.bodies[name]),
            rtol=1e-11, atol=1e-9)


def test_shear_field_exact_across_mismatched_interface():
    """vx = alpha*y, sigma=0 evolves as sxy = mu*alpha*t exactly; affine
    fields make the order-1 barycentric sweeps AND the linear interface
    maps exact, so interface-adjacent nodes inside the outer borders'
    dependence cone must match to roundoff."""
    model_name = "elastic2d"
    alpha = 1e-3
    # large enough that nodes near the interface keep a dependence-cone
    # margin from the outer (absorbing) hull: halves 16 wide, 32 tall
    g_a = SimplexGrid.box((0, 0), (16.0, 32.0), (9, 17))     # h = 2
    g_b = SimplexGrid.box((16.0, 0), (32.0, 32.0), (17, 33))  # h = 1
    nsteps = 3

    def u0_of(g):
        u = np.zeros((5, g.npoints))
        u[0] = alpha * g.points[:, 1]
        return u

    bodies = {"a": SimplexBody(g_a, ROCK, u0=u0_of(g_a)),
              "b": SimplexBody(g_b, ROCK, u0=u0_of(g_b))}
    eng = SimplexMultiEngine(
        bodies, [SimplexContactSpec("a", "b", axis=0)],
        model_name=model_name, cfl=0.6, dtype=jnp.float64)
    assert 0 in eng._ncmaps           # non-conforming auto-detected
    res = eng.run(nsteps)
    t = nsteps * eng.dt
    mu = ROCK.mu

    for name, g in (("a", g_a), ("b", g_b)):
        u = np.asarray(res.bodies[name])
        # outer hull = hull minus this side's interface nodes; check nodes
        # whose distance to it exceeds the dependence reach
        maps = eng._ncmaps[0]
        own_idx = maps.idx_a if name == "a" else maps.idx_b
        hull = np.flatnonzero(g.hull_mask())
        outer = np.setdiff1d(hull, own_idx)
        d, _ = cKDTree(g.points[outer]).query(g.points, k=1)
        h_loc = 2.0 if name == "a" else 1.0
        sel = d > (nsteps + 1.5) * h_loc
        assert sel.sum() > 5, "dependence-cone interior too small"
        np.testing.assert_allclose(
            u[0][sel], alpha * g.points[sel, 1], rtol=0, atol=1e-12,
            err_msg=name)
        np.testing.assert_allclose(
            u[3][sel], mu * alpha * t, rtol=1e-9, atol=1e-12, err_msg=name)
        np.testing.assert_allclose(u[1][sel], 0.0, atol=1e-12)
        np.testing.assert_allclose(u[2][sel], 0.0, atol=1e-9)


def test_mismatched_fracture_and_resume():
    """Fracture carries per-side masks on mismatched interfaces, and
    state_dict/load_state round-trips them."""
    g_a, g_b = _mismatched_halves()
    z = ROCK.rho * ROCK.cp

    def u0_of(g):
        u = np.zeros((5, g.npoints))
        x, y = g.points[:, 0], g.points[:, 1]
        prof = 1e6 * np.exp(-((x - 4.0) / 2.0) ** 2)
        kappa = ROCK.lam / (ROCK.lam + 2 * ROCK.mu)
        u[2] = prof
        u[4] = kappa * prof
        u[0] = -prof / z
        return u

    bodies = {"a": SimplexBody(g_a, ROCK, u0=u0_of(g_a)),
              "b": SimplexBody(g_b, ROCK, u0=np.zeros((5, g_b.npoints)))}
    spec = SimplexContactSpec("a", "b", axis=0, tensile_strength=1.0)
    eng = SimplexMultiEngine(bodies, [spec], model_name="elastic2d",
                             cfl=0.6, dtype=jnp.float64)
    assert 0 in eng._ncmaps
    res = eng.run(20)
    m = res.bonded[0]
    assert float(np.asarray(m["a"]).min()) == 0.0
    assert float(np.asarray(m["b"]).min()) == 0.0
    for v in res.bodies.values():
        assert np.isfinite(np.asarray(v)).all()

    state = jax.tree.map(np.asarray, eng.state_dict())
    eng2 = SimplexMultiEngine(bodies, [spec], model_name="elastic2d",
                              cfl=0.6, dtype=jnp.float64)
    eng2.load_state(state)
    for side in ("a", "b"):
        np.testing.assert_array_equal(
            np.asarray(eng2.bonded[0][side]),
            np.asarray(eng.bonded[0][side]))


def test_3d_interface_maps_exact_on_affine():
    """3D interface manifolds are 2D: the maps use Delaunay barycentric
    interpolation over the other side's plane nodes — exact on affine
    transverse data (the defining property), checked directly on the
    tables."""
    g_a = SimplexGrid.box((0, 0, 0), (16.0, 24.0, 24.0), (9, 13, 13),
                          jitter=0.2, seed=3)
    g_b = SimplexGrid.box((16.0, 0, 0), (32.0, 24.0, 24.0),
                          (17, 25, 25), jitter=0.2, seed=4)
    maps = pair_contact_maps(g_a, g_b, axis=0)
    f = lambda p: 0.3 + 1.7 * p[:, 1] - 0.9 * p[:, 2]
    fa = f(g_a.points[maps.idx_a])
    fb = f(g_b.points[maps.idx_b])
    np.testing.assert_allclose((fb[maps.nbr_a] * maps.w_a).sum(1), fa,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose((fa[maps.nbr_b] * maps.w_b).sum(1), fb,
                               rtol=1e-10, atol=1e-10)


def test_shear_field_across_mismatched_interface_3d():
    """Coupled 3D evolution of the affine shear field vx = a*y + b*z:
    sxy -> mu*a*t, sxz -> mu*b*t. Unlike 2D, 3D jittered Delaunay meshes
    contain slivers whose clamped-weight interpolation is deliberately
    robust rather than affine-exact, so the anchor is tolerance-based
    (mesh-quality noise ~1%); the interface itself adds no visible error
    on top (maps are exact — see the table test above)."""
    from gcm_tpu.engine_simplex import SimplexBody, SimplexMultiEngine
    from gcm_tpu.models.spec import get_model

    model = get_model("elastic3d")
    a_c, b_c = 1e-3, -2e-3
    g_a = SimplexGrid.box((0, 0, 0), (16.0, 24.0, 24.0), (9, 13, 13),
                          jitter=0.2, seed=3)                          # h=2
    g_b = SimplexGrid.box((16.0, 0, 0), (32.0, 24.0, 24.0),
                          (17, 25, 25), jitter=0.2, seed=4)            # h=1

    def u0_of(g):
        u = np.zeros((9, g.npoints))
        u[0] = a_c * g.points[:, 1] + b_c * g.points[:, 2]
        return u

    bodies = {"a": SimplexBody(g_a, ROCK, u0=u0_of(g_a)),
              "b": SimplexBody(g_b, ROCK, u0=u0_of(g_b))}
    eng = SimplexMultiEngine(
        bodies, [SimplexContactSpec("a", "b", axis=0)],
        model_name="elastic3d", cfl=0.5, dtype=np.float64)
    assert 0 in eng._ncmaps
    nsteps = 2
    res = eng.run(nsteps)
    t = nsteps * eng.dt
    mu = ROCK.mu
    comp = {n: model.comp(n) for n in ("vx", "sxy", "sxz")}
    scale_v = 2.4e-2 * 2.0      # |vx| scale over the domain
    maps = eng._ncmaps[0]
    for name, g, h_loc in (("a", g_a, 2.0), ("b", g_b, 1.0)):
        u = np.asarray(res.bodies[name])
        own_idx = maps.idx_a if name == "a" else maps.idx_b
        hull = np.flatnonzero(g.hull_mask())
        outer = np.setdiff1d(hull, own_idx)
        d, _ = cKDTree(g.points[outer]).query(g.points, k=1)
        sel = d > (nsteps + 1.5) * h_loc
        assert sel.sum() > 5, (name, sel.sum())
        pts = g.points[sel]
        err_v = np.abs(u[comp["vx"]][sel]
                       - (a_c * pts[:, 1] + b_c * pts[:, 2]))
        assert err_v.max() < 0.02 * scale_v, (name, err_v.max())
        for cn, coef in (("sxy", a_c), ("sxz", b_c)):
            vals = u[comp[cn]][sel]
            np.testing.assert_allclose(np.median(vals), mu * coef * t,
                                       rtol=2e-2, err_msg=(name, cn))
