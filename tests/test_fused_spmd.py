"""Fused full-step kernel under shard_map (interpret mode) vs global jnp.

The round-1 verdict's top item: the flagship fused kernel must run
multi-chip with the halo exchange expressed as explicit slab ppermutes and
the interior tiles computed independently of the exchange (overlap). These
tests validate numerics of that composition on the 8-virtual-device CPU
mesh: interior+ring tiling, corner-complete slabs, per-shard face-flag BC
gating, and the extended material layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.parallel.fused_spmd import (
    extended_mstack,
    make_fused_spmd_step,
)
from gcm_tpu.parallel.sharding import domain_mesh, field_sharding
from gcm_tpu.solver.gcm import step
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
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    u0 = jnp.asarray(u0, dtype=jnp.float32)
    return model, u0, mat, dt


def _run_and_compare(rng, shape, mesh_shape, order, nsteps, bx, by,
                     borders=BORDERS):
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.1, 0.9)
    ndev = int(np.prod(mesh_shape))
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:ndev],
                       shape=mesh_shape)
    mext = extended_mstack(model, mat, mesh, order)
    spmd = make_fused_spmd_step(model, mesh, dt, h, order, borders,
                                bx=bx, by=by)
    got = jax.device_put(u, field_sharding(mesh, 3))
    want = u
    for n in range(nsteps):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got = spmd(got, mext, axes)
        want = step(model, want, mat, dt, h, order, borders, axes)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, f"normalized err {err}"


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_spmd_matches_global(order, rng):
    # per-shard tile grid 4x4 (bx=4, by=8): interior AND ring kernels run
    _run_and_compare(rng, (64, 32, 16), (4, 2), order, 3, bx=4, by=8)


def test_fused_spmd_ring_only(rng):
    # per-shard tile grid 2x1: every tile on the ring, no interior call
    _run_and_compare(rng, (32, 16, 16), (4, 2), 2, 2, bx=4, by=8)


def test_fused_spmd_1d_mesh(rng):
    # 1D mesh ('sx' only): y slabs degenerate to local edge replication
    from jax.sharding import Mesh

    model, u, mat, dt = _problem(rng, (64, 24, 16))
    h = (1.0, 1.1, 0.9)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:8]), ("sx",))
    mext = extended_mstack(model, mat, mesh, 2)
    spmd = make_fused_spmd_step(model, mesh, dt, h, 2, BORDERS, bx=4, by=8)
    got = jax.device_put(u, field_sharding(mesh, 3))
    want = u
    for n in range(2):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got = spmd(got, mext, axes)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, f"normalized err {err}"


def test_fused_spmd_no_borders(rng):
    _run_and_compare(rng, (32, 32, 16), (2, 2), 2, 2, bx=8, by=8,
                     borders=None)


def test_fused_spmd_orthotropic_matches_global(rng):
    """Orthotropic media through the multi-chip fused path (per-stiffness
    material layout in the extended stack)."""
    from gcm_tpu.materials import OrthotropicMaterialFields

    shape = (32, 16, 16)
    model = get_model("elastic3d")
    ones = np.ones(shape)
    rho = 2500.0 * (1.0 + 0.2 * rng.random(shape))
    c = {"c11": 60e9 * (1 + 0.1 * rng.random(shape)), "c22": 45e9 * ones,
         "c33": 70e9 * ones, "c12": 12e9 * ones, "c13": 10e9 * ones,
         "c23": 14e9 * ones, "c44": 18e9 * ones, "c55": 22e9 * ones,
         "c66": 16e9 * ones}
    mat = OrthotropicMaterialFields.from_constants(
        rho, c, xp=jnp, dtype=jnp.float32)
    dt = 0.5 / mat.max_cp()
    u = _state_like(rng, model, shape)
    h = (1.0, 1.1, 0.9)
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
    mext = extended_mstack(model, mat, mesh, 2)
    spmd = make_fused_spmd_step(model, mesh, dt, h, 2, BORDERS, bx=4, by=8)
    got = jax.device_put(u, field_sharding(mesh, 3))
    want = u
    for n in range(2):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got = spmd(got, mext, axes)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 3e-6, f"normalized err {err}"


def _state_like(rng, model, shape):
    u = rng.standard_normal((model.ncomp,) + shape)
    u[model.dim:] *= 1e6
    return jnp.asarray(u, jnp.float32)


def test_engine_mesh_fused_matches_jnp():
    """Engine(mesh=...) + kernel='pallas_fused' — the production distributed
    path end-to-end (sources, detectors, symmetrized stages) == jnp engine."""
    import dataclasses

    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario

    task = get_scenario("elastic3d_layered", n=32, nsteps=6)
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
    res_ref = Engine(task).run()
    res_spmd = Engine(dataclasses.replace(task, kernel="pallas_fused"),
                      mesh=mesh).run()
    scale = np.abs(res_ref.u).max() + 1e-30
    assert np.abs(res_spmd.u - res_ref.u).max() / scale < 2e-5
    np.testing.assert_allclose(res_spmd.traces, res_ref.traces,
                               rtol=2e-4, atol=2e-5 * scale)


def test_engine_gspmd_pallas_guard():
    """Engine(sharding=...) with a pallas kernel must raise, not silently
    replicate (round-1 verdict weak #4)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario

    task = get_scenario("elastic3d_layered", n=16, nsteps=2)
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
    sh = NamedSharding(mesh, P(None, "sx", "sy", None))
    with pytest.raises(ValueError, match="GSPMD does not partition"):
        Engine(dataclasses.replace(task, kernel="pallas"), sharding=sh)


def test_fused_spmd_single_device_dispatch(rng):
    """On a 1-device mesh the production step dispatches to the single-chip
    fused kernel (no ring-split tax at the weak-scaling anchor); both the
    dispatch and the forced interior/ring machinery must match the global
    jnp step."""
    shape = (32, 16, 16)
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.1, 0.9)
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:1])
    mext = extended_mstack(model, mat, mesh, 2)
    fast = make_fused_spmd_step(model, mesh, dt, h, 2, BORDERS, bx=4, by=8)
    ring = make_fused_spmd_step(model, mesh, dt, h, 2, BORDERS, bx=4, by=8,
                                force_spmd=True)
    uf = jax.device_put(u, field_sharding(mesh, 3))
    ur = jax.device_put(u, field_sharding(mesh, 3))
    want = u
    for n in range(2):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        uf = fast(uf, mext, axes)
        ur = ring(ur, mext, axes)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
    for got in (np.asarray(uf), np.asarray(ur)):
        scale = np.abs(np.asarray(want)).reshape(model.ncomp, -1).max(1) + 1e-30
        err = (np.abs(got - np.asarray(want)).reshape(model.ncomp, -1).max(1)
               / scale)
        assert err.max() < 2e-6, f"normalized err {err}"


def test_fused_spmd_folds_correctors(rng):
    """Sharded fused step with the Maxwell+damage epilogue folded into the
    interior AND ring kernels == the global jnp step + corrector passes
    (VERDICT r3 item 8, multi-chip form)."""
    from gcm_tpu.ops.pallas_fused import fold_corrector_specs
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector

    shape = (32, 32, 16)
    model, u, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    corr = (MaxwellCorrector(tau=40 * dt),
            DamageCorrector(threshold=2e5, rate=0.5 / dt))
    specs, naux = fold_corrector_specs(corr, dt)
    assert naux == 1
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
    mext = extended_mstack(model, mat, mesh, 2)
    spmd = make_fused_spmd_step(model, mesh, dt, h, 2, BORDERS,
                                bx=8, by=8, correctors=specs)
    got = jax.device_put(u, field_sharding(mesh, 3))
    gaux = jax.device_put(jnp.zeros((1,) + shape, jnp.float32),
                          field_sharding(mesh, 3))
    want, waux = u, {"damage": jnp.zeros(shape, jnp.float32)}
    for n in range(3):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got, gaux = spmd(got, mext, axes, aux=gaux)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
        for c in corr:
            want, waux = c(model, want, waux, dt)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, err
    assert float(np.asarray(gaux).max()) > 1e-4, "must exercise damage"
    # atol absorbs threshold knife-edges in max(smax - thr, 0); damage is
    # in [0, 1] so 1e-5 absolute is negligible
    np.testing.assert_allclose(np.asarray(gaux[0]),
                               np.asarray(waux["damage"]),
                               rtol=1e-5, atol=1e-5)
