"""Explicit shard_map + halo-exchange path vs the global program.

Validates gcm_tpu.parallel.halo: ppermute halo exchange, border fixup
gating by axis_index, and the pallas-in-shard_map composition (interpret
mode) — the multi-chip production path (SURVEY.md §5.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.parallel.halo import make_spmd_step
from gcm_tpu.parallel.sharding import domain_mesh, shard_state
from gcm_tpu.solver.boundary import apply_borders_post
from gcm_tpu.solver.gcm import stage, step
from gcm_tpu.task import BorderSpec

BORDERS = {
    (0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("absorbing"), (1, 1): BorderSpec("fixed_force", 2e5),
    (2, 0): BorderSpec("fixed_velocity", (0.1, 0.2, -0.3)),
    (2, 1): BorderSpec("free"),
}


def _problem(rng, shape):
    model = get_model("elastic3d")
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u0[3:] *= 1e6
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return model, jnp.asarray(u0), mat, dt


def test_border_post_fixup_equivalent(rng):
    """raw sweep + apply_borders_post == sweep with in-stage borders."""
    shape = (12, 10, 8)
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.1, 0.9)
    for axis in range(3):
        want = stage(model, u, mat, dt, h, axis, 2, BORDERS)
        raw = stage(model, u, mat, dt, h, axis, 2, None)
        got = apply_borders_post(model, u, raw, mat, axis, BORDERS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_spmd_step_matches_global(order, rng):
    shape = (32, 16, 8)
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.0, 1.0)
    mesh = domain_mesh(3)

    spmd_step = make_spmd_step(model, mesh, dt, h, order, BORDERS)
    u_s, mat_s = shard_state(u, mat, mesh)
    got = u_s
    want = u
    for n in range(3):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got = spmd_step(got, mat_s, axes)
        want = step(model, want, mat, dt, h, order, BORDERS, axes)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 1e-12, f"normalized err {err}"


def test_spmd_pallas_step_matches_global(rng, monkeypatch):
    """Pallas sweeps inside shard_map (interpret mode) == global jnp step."""
    import gcm_tpu.ops.pallas_stage as ps

    orig = ps.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", wrapped)

    shape = (32, 16, 128)
    model, u, mat, dt = _problem(rng, shape)
    u = u.astype(jnp.float32)
    mat = jax.tree.map(lambda a: a.astype(jnp.float32), mat)
    h = (1.0, 1.0, 1.0)
    mesh = domain_mesh(3)
    spmd_step = make_spmd_step(model, mesh, dt, h, 2, BORDERS,
                               use_pallas=True, pallas_cx=4)
    u_s, mat_s = shard_state(u, mat, mesh)
    got = np.asarray(spmd_step(u_s, mat_s))
    want = np.asarray(step(model, u, mat, dt, h, 2, BORDERS))
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, f"normalized err {err}"
