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


def test_engine_orthotropic_task():
    """Task-level orthotropy: OrthotropicMaterial regions flow through the
    Engine (material_fields -> axis_view sweeps) and produce anisotropic
    propagation — P speed differs between x and y sweeps."""
    import jax.numpy as jnp

    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import OrthotropicMaterial
    from gcm_tpu.task import (
        AreaBall, BorderSpec, GridSpec, InitialCondition, Task, TimeSpec,
    )

    rho = 1500.0
    ortho = OrthotropicMaterial(rho=rho, c11=12.0e9, c12=2.0e9, c13=2.0e9,
                                c22=4.0e9, c23=1.5e9, c33=5.0e9,
                                c44=1.2e9, c55=1.4e9, c66=1.6e9)
    n = 61
    task = Task(
        name="ortho2d", model="elastic2d",
        grid=GridSpec(shape=(n, n), h=(1.0, 1.0)),
        default_material=ortho,
        initial=(InitialCondition(
            AreaBall(center=(30.0, 30.0), radius=2.5),
            {"sxx": 1.0, "syy": 1.0}),),
        borders={(a, s): BorderSpec("absorbing") for a in (0, 1) for s in (0, 1)},
        time=TimeSpec(cfl=0.8, nsteps=16),
        order=2,
    )
    eng = Engine(task, dtype=jnp.float64)
    res = eng.run()
    vmag = np.sqrt(res.u[0] ** 2 + res.u[1] ** 2)
    # wavefront reach along each axis from the center (rows/cols where motion
    # has arrived): faster along x (c11 > c22 => cpx > cpy)
    thresh = 0.02 * vmag.max()
    reach_x = np.abs(np.nonzero(vmag[:, 30] > thresh)[0] - 30).max()
    reach_y = np.abs(np.nonzero(vmag[30, :] > thresh)[0] - 30).max()
    cpx = np.sqrt(ortho.c11 / rho)
    cpy = np.sqrt(ortho.c22 / rho)
    assert reach_x > reach_y, (reach_x, reach_y)
    np.testing.assert_allclose(reach_x / reach_y, cpx / cpy, rtol=0.35)


def test_task_material_fields_isotropic_matches_arrays():
    """material_fields on an all-isotropic Task == MaterialFields path."""
    import jax.numpy as jnp

    from gcm_tpu.task import AreaLayer, GridSpec, MaterialRegion, Task, TimeSpec

    iso1 = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1000.0)
    iso2 = IsotropicMaterial.from_speeds(rho=2000.0, cp=3000.0, cs=1500.0)
    task = Task(
        name="t", model="elastic2d", grid=GridSpec((8, 8), (1.0, 1.0)),
        default_material=iso1,
        materials=(MaterialRegion(AreaLayer(0, 4.0, 8.0), iso2),),
        time=TimeSpec(nsteps=1),
    )
    mf = task.material_fields(xp=jnp, dtype=jnp.float64)
    assert isinstance(mf, MaterialFields)
    rho, lam, mu = task.material_arrays()
    ref = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(mf.cp), np.asarray(ref.cp))

    # mixed iso+ortho: isotropic region embeds via its orthotropic limit
    from gcm_tpu.materials import OrthotropicMaterial, OrthotropicMaterialFields

    task2 = Task(
        name="t2", model="elastic2d", grid=GridSpec((8, 8), (1.0, 1.0)),
        default_material=OrthotropicMaterial.from_isotropic(iso1),
        materials=(MaterialRegion(AreaLayer(0, 4.0, 8.0), iso2),),
        time=TimeSpec(nsteps=1),
    )
    mf2 = task2.material_fields(xp=jnp, dtype=jnp.float64)
    assert isinstance(mf2, OrthotropicMaterialFields)
    view = mf2.axis_view(0, __import__("gcm_tpu.models.spec",
                                       fromlist=["get_model"]).get_model(
                                           "elastic2d").stage(0))
    # rtol: material_arrays rasterizes float32, the orthotropic path float64
    np.testing.assert_allclose(np.asarray(view.pair_c[0]), np.asarray(ref.cp),
                               rtol=1e-6)
