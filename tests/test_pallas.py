"""Pallas fused sweep kernel vs the jnp semantics of record.

Runs in interpreter mode on CPU (tests/conftest.py pins the cpu backend);
the same kernels compile for real TPU via Mosaic — bench.py exercises that.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

import gcm_tpu.ops.pallas_stage as ps


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = ps.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", wrapped)
    yield


def _problem(rng, shape, hetero=True):
    model = get_model("elastic3d")
    if hetero:
        rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
        mu = 1e9 * (0.5 + rng.random(shape))
        lam = 1e9 * (1.0 + rng.random(shape))
    else:
        rho = 2500.0 * np.ones(shape)
        mu = 1.3e10 * np.ones(shape)
        lam = 1.1e10 * np.ones(shape)
    u0 = rng.standard_normal((model.ncomp,) + shape)
    for a in range(1, u0.ndim):
        u0 = 0.25 * np.roll(u0, 1, a) + 0.5 * u0 + 0.25 * np.roll(u0, -1, a)
    # scale stresses to stress-like magnitudes so f32 compare is meaningful
    u0[3:] *= 1e6
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return model, jnp.asarray(u0, dtype=jnp.float32), mat, dt


def _compare(model, got, want):
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = (np.abs(got - want).reshape(model.ncomp, -1).max(1)) / scale
    assert err.max() < 2e-6, f"per-comp normalized err {err}"


BORDERS = {
    (0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("fixed_force", 1e5), (1, 1): BorderSpec("free"),
    (2, 0): BorderSpec("absorbing"), (2, 1): BorderSpec("fixed_velocity", (0.1, -0.2, 0.3)),
}


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("order", [1, 2])
def test_pallas_stage_matches_jnp(axis, order, rng):
    shape = (16, 16, 256)
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.2, 0.9)
    from gcm_tpu.solver.gcm import stage as jnp_stage
    want = jnp_stage(model, u, mat, dt, h, axis, order, BORDERS)
    got = ps.pallas_stage(model, u, mat, dt, h, axis, order, BORDERS, cx=8)
    _compare(model, got, want)


def test_pallas_full_step_matches_jnp(rng):
    shape = (16, 24, 128)
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.0, 1.0)
    want = step(model, u, mat, dt, h, 2, BORDERS)
    got = ps.pallas_step(model, u, mat, dt, h, 2, BORDERS, cx=8)
    _compare(model, got, want)


@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("model_name", ["elastic2d", "acoustic2d"])
def test_pallas_2d_matches_jnp(axis, model_name, rng):
    from gcm_tpu.solver.gcm import stage as jnp_stage

    model = get_model(model_name)
    shape = (32, 256)
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = np.zeros(shape) if model_name.startswith("acoustic") \
        else 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    u0 = rng.standard_normal((model.ncomp,) + shape)
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    u = jnp.asarray(u0, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    h = (1.0, 1.3)
    borders = {(a, s): BorderSpec(k) for a in (0, 1)
               for s, k in [(0, "free"), (1, "absorbing")]}
    want = jnp_stage(model, u, mat, dt, h, axis, 2, borders)
    got = ps.pallas_stage(model, u, mat, dt, h, axis, 2, borders, cx=8)
    _compare(model, got, want)


def test_pallas_order3_uneven_chunks(rng):
    """Non-divisible sweep extent falls back to a divisor chunk."""
    shape = (24, 16, 128)
    model, u, mat, dt = _problem(rng, shape, hetero=False)
    h = (1.0, 1.0, 1.0)
    from gcm_tpu.solver.gcm import stage as jnp_stage
    want = jnp_stage(model, u, mat, dt, h, 0, 3, None)
    got = ps.pallas_stage(model, u, mat, dt, h, 0, 3, None, cx=9)
    _compare(model, got, want)
