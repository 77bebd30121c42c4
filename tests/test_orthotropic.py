"""Orthotropic material support in the structured sweeps (component 2).

Verifies the axis-dependent closed-form decomposition: P speed sqrt(c_aa/rho)
per axis, shear speeds from c44/c55/c66, zero-invariant ratios c_ab/c_aa —
via plane-wave propagation and an isotropy-consistency check (orthotropic
fields built from an isotropic material must reproduce the isotropic path
exactly).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import (
    IsotropicMaterial, MaterialFields, OrthotropicMaterialFields,
)
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec


def _iso_as_ortho(mat: IsotropicMaterial, shape):
    lam, mu = mat.lam, mat.mu
    m2 = lam + 2 * mu
    ones = np.ones(shape)
    return OrthotropicMaterialFields.from_constants(
        mat.rho * ones,
        {"c11": m2 * ones, "c22": m2 * ones, "c33": m2 * ones,
         "c12": lam * ones, "c13": lam * ones, "c23": lam * ones,
         "c44": mu * ones, "c55": mu * ones, "c66": mu * ones},
        xp=jnp, dtype=jnp.float64,
    )


def test_ortho_reduces_to_isotropic(rng):
    """Isotropic constants through the orthotropic path == isotropic path."""
    shape = (12, 10, 8)
    MAT = IsotropicMaterial.from_speeds(2500.0, 4000.0, 2300.0)
    iso = MaterialFields.uniform(MAT, shape, xp=jnp, dtype=jnp.float64)
    ortho = _iso_as_ortho(MAT, shape)
    model = get_model("elastic3d")
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u0[3:] *= 1e6
    u = jnp.asarray(u0)
    h = (1.0, 1.0, 1.0)
    dt = 0.6 / MAT.cp
    borders = {(a, s): BorderSpec(k) for a in range(3)
               for s, k in [(0, "free"), (1, "absorbing")]}
    a = step(model, u, iso, dt, h, 2, borders)
    b = step(model, u, ortho, dt, h, 2, borders)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("axis", [0, 1])
def test_ortho_axis_dependent_p_speed(axis):
    """P wave along x travels at sqrt(c11/rho), along y at sqrt(c22/rho)."""
    rho = 2000.0
    c11, c22 = (4000.0**2 * rho, 2500.0**2 * rho)
    c33 = 3000.0**2 * rho
    mu_like = 1500.0**2 * rho
    lam_like = 0.3 * c11
    n = 160
    shape = (n, n, 4) if axis == 0 else (n, n, 4)
    ortho = OrthotropicMaterialFields.from_constants(
        rho * np.ones(shape),
        {"c11": c11, "c22": c22, "c33": c33,
         "c12": lam_like, "c13": lam_like, "c23": lam_like,
         "c44": mu_like, "c55": mu_like, "c66": mu_like},
        xp=jnp, dtype=jnp.float64,
    )
    # broadcast scalars to arrays
    ortho = OrthotropicMaterialFields(
        *[jnp.broadcast_to(jnp.asarray(x, jnp.float64), shape)
          for x in (rho, c11, lam_like, lam_like, c22, lam_like, c33,
                    mu_like, mu_like, mu_like)])
    model = get_model("elastic3d")
    cexp = np.sqrt((c11 if axis == 0 else c22) / rho)
    z = rho * cexp
    h = (1.0, 1.0, 1.0)
    dt = 0.4 / 4000.0
    x = np.arange(n, dtype=float)
    prof = np.exp(-((x - 50.0) ** 2) / (2 * 5.0**2))
    u0 = np.zeros((9,) + shape)
    sigma_comp = model.comp("sxx" if axis == 0 else "syy")
    vel_comp = model.comp("vx" if axis == 0 else "vy")
    sl = (slice(None), None, 2) if axis == 0 else (None, slice(None), 2)
    u0[sigma_comp][:, :, 2] = prof[:, None] if axis == 0 else prof[None, :]
    u0[vel_comp][:, :, 2] = -(prof[:, None] if axis == 0 else prof[None, :]) / z
    # fill all z planes identically
    for k in range(shape[2]):
        u0[sigma_comp][:, :, k] = u0[sigma_comp][:, :, 2]
        u0[vel_comp][:, :, k] = u0[vel_comp][:, :, 2]
    u = jnp.asarray(u0)
    nsteps = 40
    for k in range(nsteps):
        u = step(model, u, ortho, dt, h, 2, None, axes=(axis,))
    sig = np.asarray(u[sigma_comp])
    line = sig[:, n // 2, 2] if axis == 0 else sig[n // 2, :, 2]
    peak = float(np.argmax(line))
    expect = 50.0 + cexp * nsteps * dt
    assert abs(peak - expect) <= 2.0, (peak, expect)
