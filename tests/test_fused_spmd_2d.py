"""2D fused full-step kernel under shard_map vs the global jnp program.

VERDICT r2 weak #5: sharded 2D runs previously fell back to the per-sweep
halo path. These tests validate the 2D interior/ring composition (H2-deep
aligned slab exchange, extended material stack, face-flag BC gating) on
the virtual CPU mesh, in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.parallel.fused_spmd import (
    extended_mstack_2d,
    make_fused_spmd_step_2d,
)
from gcm_tpu.parallel.sharding import domain_mesh, field_sharding
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

BORDERS = {
    (0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("fixed_force", 2e5),
    (1, 1): BorderSpec("fixed_velocity", (0.1, -0.2)),
}


def _problem(rng, shape):
    model = get_model("elastic2d")
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u0[2:] *= 1e6
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return model, jnp.asarray(u0, dtype=jnp.float32), mat, dt


def _run_and_compare(rng, shape, ndev, order, nsteps, bx,
                     borders=BORDERS):
    model, u, mat, dt = _problem(rng, shape)
    h = (1.0, 1.1)
    mesh = domain_mesh(2, devices=jax.devices("cpu")[:ndev])
    mext = extended_mstack_2d(model, mat, mesh)
    spmd = make_fused_spmd_step_2d(model, mesh, dt, h, order, borders,
                                   bx=bx)
    got = jax.device_put(u, field_sharding(mesh, 2))
    want = u
    for n in range(nsteps):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        got = spmd(got, mext, axes)
        want = step(model, want, mat, dt, h, order, borders, axes)
    got, want = np.asarray(got), np.asarray(want)
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, f"normalized err {err}"


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_spmd_2d_matches_global(order, rng):
    # 4 shards x 32 local rows, bx=8 -> 4 tiles/shard: interior AND ring
    _run_and_compare(rng, (128, 24), 4, order, 3, bx=8)


def test_fused_spmd_2d_ring_only(rng):
    # 16 local rows, bx=8 -> 2 tiles/shard: every tile on the ring
    _run_and_compare(rng, (64, 24), 4, 2, 2, bx=8)


def test_fused_spmd_2d_single_tile(rng):
    # 1 tile/shard: the lone tile is both the lo and the hi ring tile
    _run_and_compare(rng, (32, 24), 4, 2, 2, bx=8)


def test_fused_spmd_2d_1device_dispatch(rng):
    # a 1-device mesh must dispatch to the single-chip fused 2D kernel
    # and still accept the H2-extended material stack
    _run_and_compare(rng, (32, 24), 1, 2, 2, bx=8)


def test_engine_2d_mesh_fused_matches_unsharded(rng):
    """Engine(mesh=) on a 2D pallas_fused task == the same task unsharded
    (the engine path wires extended_mstack_2d + make_fused_spmd_step_2d)."""
    from gcm_tpu.engine import Engine
    from gcm_tpu.task import (
        AreaAll, GridSpec, InitialCondition, Task, TimeSpec)
    from gcm_tpu.materials import IsotropicMaterial

    mat = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)
    ic = InitialCondition(AreaAll(), values={
        "sxx": lambda X, Y: 1e6 * np.exp(
            -(((X - 32.0) ** 2 + (Y - 12.0) ** 2) / 8.0 ** 2))})
    task = Task(
        name="t2d", model="elastic2d",
        grid=GridSpec((64, 24), (1.0, 1.0)),
        default_material=mat, initial=(ic,), borders=dict(BORDERS),
        time=TimeSpec(cfl=0.8, nsteps=4), order=2, kernel="pallas_fused")
    mesh = domain_mesh(2, devices=jax.devices("cpu")[:4])
    eng_m = Engine(task, mesh=mesh)
    assert eng_m._spmd_step is not None, "2D fused spmd path not selected"
    got = eng_m.run().u
    import dataclasses

    want = Engine(dataclasses.replace(task, kernel="jnp")).run().u
    scale = np.abs(want).max() + 1e-30
    assert np.abs(got - want).max() / scale < 2e-6
