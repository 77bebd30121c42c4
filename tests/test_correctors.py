"""ODE corrector tests (SURVEY.md §0.5, component 12)."""

import dataclasses

import numpy as np
import pytest

from gcm_tpu.engine import Engine
from gcm_tpu.scenarios import get_scenario
from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector
from gcm_tpu.models.spec import get_model

import jax.numpy as jnp


def test_maxwell_relaxes_deviatoric_keeps_pressure():
    model = get_model("elastic3d")
    u = jnp.zeros((9, 4, 4, 4))
    # pure shear + isotropic part
    u = u.at[4].set(2.0)          # sxy
    for i in (3, 6, 8):           # sxx, syy, szz
        u = u.at[i].set(5.0)
    corr = MaxwellCorrector(tau=0.1)
    out, _ = corr(model, u, {}, dt=0.1)
    np.testing.assert_allclose(np.asarray(out[4]), 2.0 * np.exp(-1.0), rtol=1e-6)
    for i in (3, 6, 8):           # isotropic part preserved
        np.testing.assert_allclose(np.asarray(out[i]), 5.0, rtol=1e-6)
    # velocities untouched
    assert float(jnp.abs(out[:3]).max()) == 0.0


def test_maxwell_deviatoric_diag():
    model = get_model("elastic2d")
    u = jnp.zeros((5, 3, 3))
    u = u.at[2].set(4.0)          # sxx
    u = u.at[4].set(0.0)          # syy
    corr = MaxwellCorrector(tau=1.0)
    out, _ = corr(model, u, {}, dt=np.inf)
    # infinite time: deviatoric fully relaxed, mean = 2 preserved
    np.testing.assert_allclose(np.asarray(out[2]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[4]), 2.0, atol=1e-6)


def test_damage_grows_only_in_tension_and_degrades_stress():
    model = get_model("elastic2d")
    u = jnp.zeros((5, 2, 2))
    u = u.at[2, 0, 0].set(10.0)    # tension above threshold at one node
    u = u.at[2, 1, 1].set(-10.0)   # compression elsewhere
    corr = DamageCorrector(threshold=1.0, rate=1.0)
    aux = corr.init_aux(model, (2, 2))
    out, aux = corr(model, u, aux, dt=0.05)
    d = np.asarray(aux["damage"])
    assert d[0, 0] > 0.4
    assert d[1, 1] == 0.0
    assert float(out[2, 0, 0]) < 10.0
    assert float(out[2, 1, 1]) == -10.0


def test_engine_with_correctors_runs():
    task = get_scenario("elastic2d_ps", n=32, nsteps=20)
    task = dataclasses.replace(
        task,
        correctors=(MaxwellCorrector(tau=1e-2),
                    DamageCorrector(threshold=5e5, rate=10.0)),
    )
    eng = Engine(task)
    res = eng.run()
    assert np.isfinite(res.u).all()
    d = np.asarray(eng.aux["damage"])
    assert d.shape == task.grid.shape
    assert (d >= 0).all() and (d <= 1).all()
    # viscous run decays faster than the elastic one
    task0 = get_scenario("elastic2d_ps", n=32, nsteps=20)
    res0 = Engine(task0).run()
    assert np.abs(res.u[2:]).max() < np.abs(res0.u[2:]).max()
