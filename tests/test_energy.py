"""Energy diagnostics: decay under absorbing borders, near-conservation
inside the domain of dependence, exact plane-wave equipartition."""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec
from gcm_tpu.utils.energy import elastic_energy

MAT = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)


def _fields(shape, acoustic=False):
    ones = np.ones(shape)
    if acoustic:   # fluid: mu = 0, lam = K = rho cp^2
        lam = MAT.rho * MAT.cp ** 2 * ones
        mu = 0.0 * ones
    else:
        lam, mu = MAT.lam * ones, MAT.mu * ones
    return (MaterialFields.from_arrays(MAT.rho * ones, lam, mu, xp=jnp,
                                       dtype=jnp.float64),
            MAT.rho * ones, lam, mu)


def test_plane_wave_equipartition():
    """A traveling P plane wave has equal kinetic and potential energy;
    total = rho v^2 integrated (the exact continuum identity)."""
    model = get_model("elastic1d")
    n = 256
    x = np.arange(n) * 1.0
    prof = np.exp(-((x - 128.0) / 20.0) ** 2)
    z = MAT.rho * MAT.cp
    u = np.zeros((2, n))
    u[model.comp("sxx")] = prof
    u[model.comp("v")] = -prof / z
    _, rho, lam, mu = _fields((n,))
    E = float(elastic_energy(model, jnp.asarray(u), rho, lam, mu, h=(1.0,)))
    Ekin = float(np.sum(0.5 * rho * (prof / z) ** 2))
    np.testing.assert_allclose(E, 2.0 * Ekin, rtol=1e-12)


@pytest.mark.parametrize("model_name,shape", [("elastic2d", (48, 40)),
                                              ("acoustic2d", (48, 40))])
def test_energy_decays_with_absorbing_borders(model_name, shape, rng):
    """E(t) is non-increasing (up to roundoff) with absorbing borders —
    nothing enters, outgoing characteristics leave."""
    model = get_model(model_name)
    u0 = rng.standard_normal((model.ncomp,) + shape)
    for a in range(1, 3):
        u0 = 0.25 * np.roll(u0, 1, a) + 0.5 * u0 + 0.25 * np.roll(u0, -1, a)
    u0[model.dim:] *= 1e6
    mat, rho, lam, mu = _fields(shape, acoustic=model_name.startswith("ac"))
    h = (1.0, 1.0)
    dt = 0.5 / MAT.cp
    borders = {(a, s): BorderSpec("absorbing") for a in range(2)
               for s in (0, 1)}
    u = jnp.asarray(u0)
    E_prev = float(elastic_energy(model, u, rho, lam, mu, h=h))
    E0 = E_prev
    for n in range(30):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        u = step(model, u, mat, dt, h, 2, borders, axes)
        E = float(elastic_energy(model, u, rho, lam, mu, h=h))
        assert E <= E_prev * (1.0 + 1e-9), (n, E, E_prev)
        E_prev = E
    # random data radiates: a sizable fraction must actually leave
    assert E_prev < 0.9 * E0
