"""Vectorized solver vs per-node NumPy oracle: the core parity tests.

SURVEY.md §4: every BASELINE.json config family is run N steps and compared
allclose against the independent loop-based oracle (the stand-in for the
reference binary while /root/reference is empty).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.oracle import oracle_run
from gcm_tpu.solver.gcm import axes_order, step
from gcm_tpu.task import BorderSpec


def random_state(model, shape, rng, smooth=True):
    u = rng.standard_normal((model.ncomp,) + shape)
    if smooth:
        # band-limit so high interpolation orders behave
        for a in range(1, u.ndim):
            u = 0.25 * np.roll(u, 1, a) + 0.5 * u + 0.25 * np.roll(u, -1, a)
    return u.astype(np.float64)


def hetero_materials(shape, rng):
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    return rho, lam, mu


def run_solver(model_name, u0, rho, lam, mu, dt, h, order, nsteps,
               borders=None, symmetrize=True):
    model = get_model(model_name)
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    u = jnp.asarray(u0)
    for n in range(nsteps):
        ax = axes_order(model.dim, n, symmetrize)
        u = step(model, u, mat, dt, h, order, borders, ax)
    return np.asarray(u)


CASES_1D = [("acoustic1d", 1), ("acoustic1d", 2), ("elastic1d", 2)]


@pytest.mark.parametrize("model_name,order", CASES_1D)
def test_parity_1d(model_name, order, rng):
    shape = (31,)
    rho, lam, mu = hetero_materials(shape, rng)
    if model_name.startswith("acoustic"):
        mu = np.zeros(shape)
    model = get_model(model_name)
    u0 = random_state(model, shape, rng)
    h = (1.0,)
    dt = 0.5 * h[0] / np.sqrt((lam + 2 * mu) / rho).max()
    borders = {(0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing")}
    ours = run_solver(model_name, u0, rho, lam, mu, dt, h, order, 5, borders)
    ref = oracle_run(model_name, u0, rho, lam, mu, dt, h, order, 5, borders)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_parity_2d_elastic(order, rng):
    shape = (12, 14)
    rho, lam, mu = hetero_materials(shape, rng)
    model = get_model("elastic2d")
    u0 = random_state(model, shape, rng)
    h = (1.0, 1.3)
    dt = 0.6 * min(h) / np.sqrt((lam + 2 * mu) / rho).max()
    borders = {
        (0, 0): BorderSpec("free"),
        (0, 1): BorderSpec("fixed_force", 0.5),
        (1, 0): BorderSpec("fixed_velocity", (0.1, -0.2)),
        (1, 1): BorderSpec("absorbing"),
    }
    ours = run_solver("elastic2d", u0, rho, lam, mu, dt, h, order, 4, borders)
    ref = oracle_run("elastic2d", u0, rho, lam, mu, dt, h, order, 4, borders)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_parity_3d_elastic(rng):
    shape = (8, 9, 10)
    rho, lam, mu = hetero_materials(shape, rng)
    model = get_model("elastic3d")
    u0 = random_state(model, shape, rng)
    h = (1.0, 1.1, 0.9)
    dt = 0.7 * min(h) / np.sqrt((lam + 2 * mu) / rho).max()
    borders = {(a, s): BorderSpec(k)
               for a, s, k in [(0, 0, "free"), (0, 1, "absorbing"),
                               (1, 0, "absorbing"), (1, 1, "free"),
                               (2, 0, "absorbing"), (2, 1, "absorbing")]}
    ours = run_solver("elastic3d", u0, rho, lam, mu, dt, h, 2, 3, borders)
    ref = oracle_run("elastic3d", u0, rho, lam, mu, dt, h, 2, 3, borders)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_parity_3d_acoustic(rng):
    shape = (7, 8, 9)
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    lam = 2.25e9 * (0.8 + 0.4 * rng.random(shape))
    mu = np.zeros(shape)
    model = get_model("acoustic3d")
    u0 = random_state(model, shape, rng)
    h = (1.0, 1.0, 1.0)
    dt = 0.8 / np.sqrt(lam / rho).max()
    ours = run_solver("acoustic3d", u0, rho, lam, mu, dt, h, 2, 3)
    ref = oracle_run("acoustic3d", u0, rho, lam, mu, dt, h, 2, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)
