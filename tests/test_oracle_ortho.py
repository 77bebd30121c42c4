"""Orthotropic oracle parity (VERDICT r2 missing #6).

The solver's orthotropic path (closed-form characteristic pairs from
gcm_tpu.models.spec) is checked against a fully independent anchor:
gcm_tpu.oracle.oracle_ortho assembles the per-axis PDE Jacobian from the
raw stiffness constants and eigendecomposes it numerically per node.
Comparison restricts to nodes whose domain of dependence stays inside the
grid (no border conditions involved on either side).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import (
    IsotropicMaterial, OrthotropicMaterial, OrthotropicMaterialFields,
)
from gcm_tpu.models.spec import get_model
from gcm_tpu.oracle.oracle_ortho import (
    build_jacobian, oracle_ortho_run,
)
from gcm_tpu.ops.interp import stencil_radius
from gcm_tpu.solver.gcm import step

ORTHO = OrthotropicMaterial(rho=1500.0,
                            c11=12.0e9, c12=2.5e9, c13=1.8e9,
                            c22=9.0e9, c23=2.1e9, c33=14.0e9,
                            c44=2.2e9, c55=3.1e9, c66=2.7e9)
ORTHO2 = OrthotropicMaterial(rho=2200.0,
                             c11=20.0e9, c12=4.0e9, c13=3.0e9,
                             c22=16.0e9, c23=3.5e9, c33=24.0e9,
                             c44=4.0e9, c55=5.5e9, c66=4.8e9)


def _smooth(rng, shape, ncomp):
    u = rng.standard_normal((ncomp,) + shape)
    for a in range(1, len(shape) + 1):
        u = 0.25 * np.roll(u, 1, a) + 0.5 * u + 0.25 * np.roll(u, -1, a)
    return u


def _fields_uniform(m, shape, dim):
    return OrthotropicMaterialFields.from_constants(
        np.full(shape, m.rho), {k: np.full(shape, v)
                                for k, v in m.constants().items()},
        xp=jnp, dtype=jnp.float64)


def _max_speed(m):
    return max(np.sqrt(c / m.rho) for c in
               (m.c11, m.c22, m.c33, m.c44, m.c55, m.c66))


def test_jacobian_isotropic_limit_matches_lame():
    """The from-physics Jacobian reproduces the textbook isotropic wave
    speeds (an internal sanity of the oracle itself)."""
    iso = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)
    m = OrthotropicMaterial.from_isotropic(iso)
    model = get_model("elastic3d")
    for ax in range(3):
        A = build_jacobian(model, m, ax)
        vals = np.sort(np.linalg.eigvals(A).real)
        got = sorted(abs(v) for v in vals if abs(v) > 1.0)
        np.testing.assert_allclose(
            sorted(got), [1100.0, 1100.0, 1100.0, 1100.0, 2000.0, 2000.0],
            rtol=1e-9)


@pytest.mark.parametrize("order", [1, 2])
def test_solver_matches_ortho_oracle_2d(order, rng):
    model = get_model("elastic2d")
    shape = (16, 14)
    h = (10.0, 10.0)
    nsteps = 3
    dt = 0.6 * min(h) / _max_speed(ORTHO)
    u0 = _smooth(rng, shape, model.ncomp)

    mat = _fields_uniform(ORTHO, shape, 2)
    u = jnp.asarray(u0, dtype=jnp.float64)
    for n in range(nsteps):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        u = step(model, u, mat, dt, h, order, None, axes)
    got = np.asarray(u)

    want = oracle_ortho_run("elastic2d", u0, ORTHO, dt, h, order, nsteps)

    r = nsteps * stencil_radius(order) + 1
    sl = (slice(None), slice(r, -r), slice(r, -r))
    np.testing.assert_allclose(got[sl], want[sl], rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("order", [1, 2])
def test_solver_matches_ortho_oracle_3d(order, rng):
    model = get_model("elastic3d")
    shape = (10, 9, 8)
    h = (10.0, 10.0, 10.0)
    nsteps = 2
    dt = 0.6 * min(h) / _max_speed(ORTHO)
    u0 = _smooth(rng, shape, model.ncomp)

    mat = _fields_uniform(ORTHO, shape, 3)
    u = jnp.asarray(u0, dtype=jnp.float64)
    for n in range(nsteps):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        u = step(model, u, mat, dt, h, order, None, axes)
    got = np.asarray(u)

    want = oracle_ortho_run("elastic3d", u0, ORTHO, dt, h, order, nsteps)

    r = nsteps * stencil_radius(order) + 1
    sl = (slice(None),) + (slice(r, -r),) * 3
    np.testing.assert_allclose(got[sl], want[sl], rtol=1e-8, atol=1e-10)


def test_solver_matches_ortho_oracle_heterogeneous_2d(rng):
    """Layered orthotropic medium: each node's decomposition is frozen at
    its own material on both sides (SURVEY.md §0.2)."""
    model = get_model("elastic2d")
    shape = (16, 12)
    h = (10.0, 10.0)
    nsteps = 3
    order = 2
    dt = 0.6 * min(h) / max(_max_speed(ORTHO), _max_speed(ORTHO2))
    u0 = _smooth(rng, shape, model.ncomp)

    layer = np.arange(shape[1]) >= shape[1] // 2   # top half = ORTHO2
    mats_obj = np.empty(shape, dtype=object)
    for idx in np.ndindex(*shape):
        mats_obj[idx] = ORTHO2 if layer[idx[1]] else ORTHO

    rho = np.where(layer, ORTHO2.rho, ORTHO.rho) * np.ones(shape)
    cdict = {k: np.where(layer, getattr(ORTHO2, k), getattr(ORTHO, k))
             * np.ones(shape) for k in ORTHO.constants()}
    mat = OrthotropicMaterialFields.from_constants(
        rho, cdict, xp=jnp, dtype=jnp.float64)

    u = jnp.asarray(u0, dtype=jnp.float64)
    for n in range(nsteps):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        u = step(model, u, mat, dt, h, order, None, axes)
    got = np.asarray(u)

    want = oracle_ortho_run("elastic2d", u0, mats_obj, dt, h, order, nsteps)

    r = nsteps * stencil_radius(order) + 1
    sl = (slice(None), slice(r, -r), slice(r, -r))
    np.testing.assert_allclose(got[sl], want[sl], rtol=1e-8, atol=1e-10)
