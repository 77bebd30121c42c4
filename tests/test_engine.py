"""Engine-level tests: scenario runs, sources, detectors, multi-body."""

import numpy as np
import pytest

from gcm_tpu.engine import Engine
from gcm_tpu.engine_multi import MultiBodyEngine
from gcm_tpu.scenarios import elastic3d_contact, get_scenario, list_scenarios


def test_scenario_registry():
    names = list_scenarios()
    for expect in ("acoustic1d", "elastic2d_ps", "elastic3d_layered",
                   "elastic3d_explosion"):
        assert expect in names


def test_acoustic1d_end_to_end():
    task = get_scenario("acoustic1d", n=256, nsteps=200)
    res = Engine(task).run()
    assert res.nsteps == 200
    assert np.isfinite(res.u).all()
    # two half-amplitude pulses + absorbing ends
    assert res.traces.shape == (200, 1, 2)
    peak = res.traces[:, 0, 1].max()
    assert 0.4e5 < peak < 0.6e5


def test_explosion_source_radiates():
    task = get_scenario("elastic3d_explosion", n=24, nsteps=40)
    res = Engine(task).run()
    assert np.isfinite(res.u).all()
    # surface receiver sees the event
    assert np.abs(res.traces[:, 0, :3]).max() > 0


def test_multibody_contact_scenario_runs():
    bodies, contacts = elastic3d_contact(n=16, nsteps=20)
    eng = MultiBodyEngine(bodies, contacts)
    res = eng.run()
    for u in res.bodies.values():
        assert np.isfinite(u).all()
    assert 0 in res.bonded
    b = res.bonded[0]
    assert b.shape == (16, 16)
    assert ((b == 0) | (b == 1)).all()
