"""Physics-sequence tests (SURVEY.md §4): known analytic GCM behaviors.

- 1D invariant transport is an exact shift at CFL = 1;
- plane P/S waves propagate at c_p/c_s;
- free surface reflects with the right sign and keeps traction == 0;
- absorbing boundary lets a pulse leave with negligible residual.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

MAT = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1000.0)


def uniform_mat(shape, mat=MAT):
    return MaterialFields.uniform(mat, shape, xp=jnp, dtype=jnp.float64)


def gaussian(x, x0, w):
    return np.exp(-((x - x0) ** 2) / (2 * w * w))


def test_acoustic_cfl1_exact_shift():
    """nu == 1, order 1: each invariant moves exactly one cell per step."""
    n, h, c = 64, 1.0, 1500.0
    mat = uniform_mat((n,), IsotropicMaterial.from_speeds(1000.0, c))
    model = get_model("acoustic1d")
    dt = h / c
    x = np.arange(n) * h
    p0 = gaussian(x, 32.0, 4.0)
    z = 1000.0 * c
    # pure right-going wave: w_R = p + z v carries everything, w_L = 0
    v0 = p0 / z
    u = jnp.asarray(np.stack([v0, p0]))
    for _ in range(10):
        u = step(model, u, mat, dt, (h,), order=1)
    out = np.asarray(u)
    np.testing.assert_allclose(out[1][10:], p0[:-10], atol=1e-12)
    np.testing.assert_allclose(out[0][10:], v0[:-10], atol=1e-14)


@pytest.mark.parametrize("wave,speed", [("p", MAT.cp), ("s", MAT.cs)])
def test_plane_wave_speed_2d(wave, speed):
    """A plane wave along x moves at c_p (P) / c_s (S) — order 2, nu<1."""
    n, h = 128, 1.0
    shape = (n, 4)
    mat = uniform_mat(shape)
    model = get_model("elastic2d")
    dt = 0.5 * h / MAT.cp
    x = np.arange(n) * h
    prof = gaussian(x, 40.0, 6.0)
    u0 = np.zeros((model.ncomp,) + shape)
    if wave == "p":
        z = MAT.rho * MAT.cp
        # right-going P: w_R = sxx − z vx nonzero... right-mover carries
        # sxx = prof, vx = −prof/z  (w_L = sxx + z vx = 0)
        u0[model.comp("sxx")] = prof[:, None]
        u0[model.comp("vx")] = -prof[:, None] / z
    else:
        z = MAT.rho * MAT.cs
        u0[model.comp("sxy")] = prof[:, None]
        u0[model.comp("vy")] = -prof[:, None] / z
    nsteps = 40
    u = jnp.asarray(u0)
    for k in range(nsteps):
        u = step(model, u, mat, dt, (h, h), order=2)
    comp = model.comp("sxx") if wave == "p" else model.comp("sxy")
    outp = np.asarray(u)[comp][:, 2]
    x_peak = x[np.argmax(outp)]
    expect = 40.0 + speed * nsteps * dt
    assert abs(x_peak - expect) <= 1.5 * h
    # amplitude preserved within a few percent (order-2, smooth pulse)
    assert abs(outp.max() - prof.max()) < 0.05


def test_free_surface_traction_zero_and_reflection():
    """Left free face: sigma_xx stays 0 there; pulse reflects with flipped
    stress sign and preserved amplitude."""
    n, h = 200, 1.0
    shape = (n,)
    mat = uniform_mat(shape, IsotropicMaterial.from_speeds(1000.0, 2000.0))
    model = get_model("elastic1d")
    dt = 0.5 * h / 2000.0
    x = np.arange(n) * h
    prof = gaussian(x, 60.0, 8.0)
    z = 1000.0 * 2000.0
    u0 = np.zeros((2,) + shape)
    # left-going pulse: w_L = sxx + z v carries it (sxx = prof, v = prof/z)
    u0[1] = prof
    u0[0] = prof / z
    borders = {(0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing")}
    u = jnp.asarray(u0)
    sxx_at_face = []
    nsteps = 240  # pulse travels 60 cells to face and back out to ~60
    for _ in range(nsteps):
        u = step(model, u, mat, dt, (h,), order=2, borders=borders)
        sxx_at_face.append(float(u[1, 0]))
    assert max(abs(s) for s in sxx_at_face) < 1e-12  # traction enforced
    out = np.asarray(u)
    # reflected wave is right-going with stress sign flipped
    assert out[1].min() < -0.9 * prof.max()
    assert out[1].max() < 0.1 * prof.max()


def test_absorbing_boundary_absorbs():
    n, h = 128, 1.0
    mat = uniform_mat((n,), IsotropicMaterial.from_speeds(1000.0, 2000.0))
    model = get_model("acoustic1d")
    dt = 0.5 * h / 2000.0
    x = np.arange(n) * h
    p0 = gaussian(x, 96.0, 6.0)
    z = 2e6
    u = jnp.asarray(np.stack([p0 / z, p0]))  # right-going
    borders = {(0, 0): BorderSpec("absorbing"), (0, 1): BorderSpec("absorbing")}
    for _ in range(200):
        u = step(model, u, mat, dt, (h,), order=2, borders=borders)
    # everything should have left the domain
    assert float(jnp.abs(u).max()) < 5e-3 * p0.max()


def test_rinv_r_roundtrip_random(rng):
    """One zero-dt step is the identity (R @ R^{-1} == I in closed form)."""
    shape = (9, 9)
    model = get_model("elastic2d")
    mat = uniform_mat(shape)
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u = step(model, jnp.asarray(u0), mat, 0.0, (1.0, 1.0), order=2)
    np.testing.assert_allclose(np.asarray(u), u0, atol=1e-12)
