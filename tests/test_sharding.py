"""Sharded-vs-unsharded equivalence on an 8-device virtual CPU mesh.

SURVEY.md §4 "Distributed": the same scenario on 1 device vs k-way sharded
must be allclose — this is this framework's race/comm-correctness check
(the functional analogue of the reference's MPI tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.parallel.sharding import domain_mesh, shard_state
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec


def _problem(rng, shape, model_name):
    model = get_model(model_name)
    dim = len(shape)
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    if model_name.startswith("acoustic"):
        mu = np.zeros(shape)
    lam = 1e9 * (1.0 + rng.random(shape))
    u0 = rng.standard_normal((model.ncomp,) + shape)
    h = tuple(1.0 for _ in range(dim))
    dt = 0.6 / np.sqrt((lam + 2 * mu) / rho).max()
    borders = {(a, s): BorderSpec(k) for a in range(dim) for s, k in
               [(0, "free"), (1, "absorbing")]}
    return model, u0, rho, lam, mu, h, dt, borders


@pytest.mark.parametrize("model_name,shape", [
    ("elastic2d", (64, 32)),
    ("elastic3d", (16, 16, 8)),
    ("acoustic3d", (16, 24, 8)),
])
def test_sharded_equals_unsharded(model_name, shape, rng):
    model, u0, rho, lam, mu, h, dt, borders = _problem(rng, shape, model_name)
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    u = jnp.asarray(u0)

    def run(u, mat, nsteps=4):
        f = jax.jit(lambda u: _steps(u, mat, nsteps))
        return np.asarray(f(u))

    def _steps(u, mat, nsteps):
        for n in range(nsteps):
            axes = tuple(range(model.dim))
            if n % 2:
                axes = axes[::-1]
            u = step(model, u, mat, dt, h, 2, borders, axes)
        return u

    ref = run(u, mat)

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = domain_mesh(model.dim)
    u_s, mat_s = shard_state(u, mat, mesh)
    got = run(u_s, mat_s)
    # per-component scale-normalized compare: partitioned executions reorder
    # float reductions, so demand ~machine-eps relative per field, not atol=0
    scale = np.abs(ref).reshape(model.ncomp, -1).max(axis=1)
    scale = scale.reshape((-1,) + (1,) * model.dim) + 1e-300
    err = np.abs(got - ref) / scale
    assert err.max() < 1e-12, f"normalized mismatch {err.max():.3e}"


def test_multibody_contact_sharded_equals_unsharded(rng):
    """Two bonded bodies with fracture state, sharded vs unsharded."""
    from gcm_tpu.parallel.sharding import field_sharding, material_sharding
    from gcm_tpu.solver.contact import ContactSpec
    from gcm_tpu.solver.multi import step_multi

    model = get_model("elastic3d")
    shape = (16, 12, 6)
    rho = 2000.0 * (1.0 + 0.3 * rng.random(shape))
    mu = 1e9 * (0.6 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float64)
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u0[3:] *= 1e5
    dt = 0.5 / float(np.sqrt((lam + 2 * mu) / rho).max())
    h = (1.0, 1.0, 1.0)
    contact = ContactSpec("a", "b", axis=2, kind="bonded",
                          tensile_strength=3e4)
    borders = {"a": {}, "b": {}}

    def run(us, mats, bonded):
        f = jax.jit(lambda us, bonded: step_multi(
            model, us, mats, dt, {"a": h, "b": h}, 2, borders,
            (contact,), bonded))
        for _ in range(3):
            us, bonded = f(us, bonded)
        return us, bonded

    us0 = {"a": jnp.asarray(u0), "b": jnp.asarray(u0[:, ::-1] * 0.5)}
    bonded0 = {0: jnp.ones(shape[:2])}
    ref_us, ref_b = run(us0, {"a": mat, "b": mat}, bonded0)

    mesh = domain_mesh(3)
    fs = field_sharding(mesh, 3)
    ms = material_sharding(mesh, 3)
    us_s = {k: jax.device_put(v, fs) for k, v in us0.items()}
    mat_s = jax.tree.map(lambda a: jax.device_put(a, ms), mat)
    b_s = {0: jax.device_put(bonded0[0],
                             jax.NamedSharding(mesh, jax.P("sx", "sy")))}
    got_us, got_b = run(us_s, {"a": mat_s, "b": mat_s}, b_s)

    for k in ref_us:
        ref, got = np.asarray(ref_us[k]), np.asarray(got_us[k])
        scale = np.abs(ref).reshape(model.ncomp, -1).max(1) + 1e-300
        err = np.abs(got - ref).reshape(model.ncomp, -1).max(1) / scale
        assert err.max() < 1e-12, (k, err)
    np.testing.assert_array_equal(np.asarray(got_b[0]), np.asarray(ref_b[0]))


def test_mesh_shapes():
    mesh3 = domain_mesh(3)
    assert mesh3.devices.size == 8 and mesh3.axis_names == ("sx", "sy")
    mesh2 = domain_mesh(2)
    assert mesh2.devices.size == 8 and mesh2.axis_names == ("sx",)
