"""Fused full-step Pallas kernel vs the jnp semantics of record.

The fused kernel (gcm_tpu.ops.pallas_fused) runs all three splitting sweeps
of a 3D step in one HBM pass, recomputing halo sweeps from corner-complete
windows.  It must reproduce solver.gcm.step exactly: same stencils, same
edge clamping, same characteristic border conditions, both symmetrized axis
orders.  Runs in interpreter mode on CPU (tests/conftest.py pins the cpu
backend); bench.py exercises the Mosaic-compiled TPU path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.ops.pallas_fused import fused_step, stack_mats
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

BORDERS = {
    (0, 0): BorderSpec("free"),
    (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("fixed_force", value=(1e5, 2e5, -1e5)),
    (1, 1): BorderSpec("fixed_velocity", value=(0.1, -0.2, 0.3)),
    (2, 0): BorderSpec("absorbing"),
    (2, 1): BorderSpec("free"),
}


def _problem(rng, shape, name="elastic3d"):
    model = get_model(name)
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    if name.startswith("acoustic"):
        mu = np.zeros(shape)
    lam = 1e9 * (1.0 + rng.random(shape))
    u0 = rng.standard_normal((model.ncomp,) + shape)
    for a in range(1, u0.ndim):
        u0 = 0.25 * np.roll(u0, 1, a) + 0.5 * u0 + 0.25 * np.roll(u0, -1, a)
    u0[model.dim:] *= 1e6
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return model, jnp.asarray(u0, dtype=jnp.float32), mat, dt


def _compare(model, got, want, tol=2e-6):
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = (np.abs(got - want).reshape(model.ncomp, -1).max(1)) / scale
    assert err.max() < tol, f"per-comp normalized err {err}"


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("axes", [(0, 1, 2), (2, 1, 0)])
def test_fused_step_parity(rng, order, axes):
    shape = (8, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 12.0, 9.0)
    want = step(model, u0, mat, dt, h, order, BORDERS, axes)
    ms = stack_mats(model, mat)
    got = fused_step(model, u0, ms, dt, h, order, BORDERS, axes,
                     bx=4, by=8, interpret=True)
    _compare(model, got, want)


def test_fused_step_multitile_corners(rng):
    """3x3 tiling exercises interior tiles, edge tiles and corner windows."""
    shape = (12, 24, 16)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    u = u0
    want = u0
    ms = stack_mats(model, mat)
    for n in range(4):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
        u = fused_step(model, u, ms, dt, h, 2, BORDERS, axes,
                       bx=4, by=8, interpret=True)
    _compare(model, u, want, tol=5e-6)


def test_fused_step_no_borders(rng):
    """Border-free (pure edge-clamp) semantics must also match."""
    shape = (8, 8, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    want = step(model, u0, mat, dt, h, 2, None, (0, 1, 2))
    ms = stack_mats(model, mat)
    got = fused_step(model, u0, ms, dt, h, 2, None, (0, 1, 2),
                     bx=4, by=8, interpret=True)
    _compare(model, got, want)


def test_fused_step_acoustic(rng):
    shape = (8, 16, 8)
    model, u0, mat, dt = _problem(rng, shape, name="acoustic3d")
    h = (5.0, 5.0, 5.0)
    borders = {(0, 0): BorderSpec("free"), (2, 1): BorderSpec("absorbing")}
    want = step(model, u0, mat, dt, h, 2, borders, (2, 1, 0))
    ms = stack_mats(model, mat)
    got = fused_step(model, u0, ms, dt, h, 2, borders, (2, 1, 0),
                     bx=4, by=8, interpret=True)
    _compare(model, got, want)


def test_fused_step_single_tile(rng):
    """One tile: every window segment is a clamped self-read, fully patched."""
    shape = (8, 8, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    want = step(model, u0, mat, dt, h, 2, BORDERS, (0, 1, 2))
    ms = stack_mats(model, mat)
    got = fused_step(model, u0, ms, dt, h, 2, BORDERS, (0, 1, 2),
                     bx=8, by=8, interpret=True)
    _compare(model, got, want)


def test_engine_pallas_fused_matches_jnp(monkeypatch):
    """Engine with kernel='pallas_fused' (interpret mode) == jnp engine."""
    import dataclasses

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    task = get_scenario("elastic3d_layered", n=16, nsteps=6)
    res_jnp = Engine(task).run()
    res_fus = Engine(dataclasses.replace(
        task, kernel="pallas_fused", scan_unroll=2)).run()
    scale = np.abs(res_jnp.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res_fus.u - res_jnp.u).reshape(9, -1).max(1) / scale
    assert err.max() < 2e-5, err
    np.testing.assert_allclose(res_fus.traces, res_jnp.traces,
                               rtol=1e-3, atol=1e-5 * scale.max())
