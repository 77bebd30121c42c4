"""Convergence-order and equivalence tests (SURVEY.md §4/§5).

- the order-2 scheme converges at ~2nd order on smooth traveling waves;
- jit and eager execution agree (the functional-model stand-in for the
  reference's race detection, ARCHITECTURE.md aux table).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec


def _advect_error(n, order, nu=0.37):
    """L2 error of a smooth periodic-ish pulse advected across 1/4 domain."""
    model = get_model("acoustic1d")
    c = 1500.0
    L = 1000.0
    h = L / n
    mat = MaterialFields.uniform(
        IsotropicMaterial.from_speeds(1000.0, c), (n,), xp=jnp,
        dtype=jnp.float64)
    dt = nu * h / c
    x = (np.arange(n) + 0.5) * h
    z = 1000.0 * c
    # tight pulse far from the ends: boundary influence ~exp(-40), so the
    # measured error is pure interpolation error
    w = 35.0
    x0 = 400.0
    prof = np.exp(-((x - x0) ** 2) / (2 * w * w))
    u = jnp.asarray(np.stack([prof / z, prof]))
    t_target = 150.0 / c
    nsteps = int(round(t_target / dt))
    for _ in range(nsteps):
        u = step(model, u, mat, dt, (h,), order)
    t = nsteps * dt
    exact = np.exp(-((x - x0 - c * t) ** 2) / (2 * w * w))
    err = np.sqrt(np.mean((np.asarray(u[1]) - exact) ** 2))
    return err


@pytest.mark.parametrize("order,expected_rate", [(1, 1.0), (2, 2.0), (3, 3.0)])
def test_convergence_rate(order, expected_rate):
    e1 = _advect_error(500, order)
    e2 = _advect_error(1000, order)
    rate = np.log2(e1 / e2)
    assert rate > expected_rate - 0.4, (e1, e2, rate)


def test_jit_eager_equivalence(rng):
    model = get_model("elastic2d")
    shape = (24, 20)
    rho = 1000.0 * (1.0 + rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    u = jnp.asarray(rng.standard_normal((model.ncomp,) + shape))
    dt = 0.5 / float(np.sqrt((lam + 2 * mu) / rho).max())
    borders = {(a, s): BorderSpec("free") for a in (0, 1) for s in (0, 1)}

    def f(u):
        return step(model, u, mat, dt, (1.0, 1.0), 2, borders)

    eager = np.asarray(f(u))
    jitted = np.asarray(jax.jit(f)(u))
    # fusion reorders float ops; demand near-machine-eps relative per comp
    scale = np.abs(eager).reshape(model.ncomp, -1).max(1) + 1e-300
    err = np.abs(jitted - eager).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 1e-11, err
