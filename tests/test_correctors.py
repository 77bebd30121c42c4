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


def test_damage_does_not_compound_when_frozen():
    """A node whose damage has stopped growing (stress below threshold)
    must KEEP its stress: degradation is incremental —
    sigma *= (1-d_new)/(1-d_old) — so the cumulative scaling is (1-d)
    versus the undamaged evolution, not (1-d)^nsteps (code-review r5:
    the compounding form decayed partially-damaged nodes to zero at a
    dt-dependent rate)."""
    model = get_model("elastic2d")
    u = jnp.zeros((5, 2, 2))
    u = u.at[2, 0, 0].set(10.0)
    u = u.at[3, 0, 0].set(4.0)     # shear rides along
    corr = DamageCorrector(threshold=1.0, rate=1.0)
    aux = corr.init_aux(model, (2, 2))
    # one damaging step
    u1, aux = corr(model, u, aux, dt=0.05)
    d1 = float(np.asarray(aux["damage"])[0, 0])
    assert 0.0 < d1 < 1.0
    np.testing.assert_allclose(float(u1[2, 0, 0]), 10.0 * (1 - d1),
                               rtol=1e-6)
    # drop the stress below threshold so d freezes; repeated steps must
    # now be identity on the stress
    u_low = u1.at[2, 0, 0].set(0.5).at[3, 0, 0].set(0.2)
    out = u_low
    for _ in range(5):
        out, aux = corr(model, out, aux, dt=0.05)
    assert float(np.asarray(aux["damage"])[0, 0]) == pytest.approx(d1)
    np.testing.assert_allclose(float(out[2, 0, 0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(out[3, 0, 0]), 0.2, rtol=1e-6)
    # fully-damaged nodes carry zero stress and stay there
    aux_full = {"damage": jnp.ones((2, 2), jnp.float32)}
    out_full, aux_full = corr(model, u, aux_full, dt=0.05)
    assert float(out_full[2, 0, 0]) == 0.0
