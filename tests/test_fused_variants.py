"""Fused-kernel variants: material layouts (compact/orthotropic), the
2D fused kernel, and the slab-tiled 3D kernel — interpret-mode parity
against the jnp semantics-of-record (round-1 verdict item 6)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields, OrthotropicMaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.ops.pallas_fused import (
    fused_step,
    fused_step_2d,
    fused_step_slab,
    infer_layout,
    mat_layout,
    ortho_mat_layout,
    stack_mats,
    stack_mats_ortho,
)
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

B3 = {
    (0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("absorbing"), (1, 1): BorderSpec("fixed_force", 2e5),
    (2, 0): BorderSpec("fixed_velocity", (0.1, 0.2, -0.3)),
    (2, 1): BorderSpec("free"),
}
B2 = {
    (0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
    (1, 0): BorderSpec("absorbing"), (1, 1): BorderSpec("fixed_force", 2e5),
}


def _iso(rng, shape):
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return mat, dt


def _ortho(rng, shape):
    ones = np.ones(shape)
    rho = 2500.0 * (1.0 + 0.2 * rng.random(shape))
    c = {"c11": 60e9 * (1 + 0.1 * rng.random(shape)), "c22": 45e9 * ones,
         "c33": 70e9 * (1 + 0.1 * rng.random(shape)), "c12": 12e9 * ones,
         "c13": 10e9 * ones, "c23": 14e9 * ones, "c44": 18e9 * ones,
         "c55": 22e9 * (1 + 0.1 * rng.random(shape)), "c66": 16e9 * ones}
    mat = OrthotropicMaterialFields.from_constants(
        rho, c, xp=jnp, dtype=jnp.float32)
    return mat, 0.5 / mat.max_cp()


def _state(rng, model, shape):
    u = rng.standard_normal((model.ncomp,) + shape)
    u[model.dim:] *= 1e6
    return jnp.asarray(u, jnp.float32)


def _err(got, want, ncomp):
    got, want = np.asarray(got), np.asarray(want)
    sc = np.abs(want).reshape(ncomp, -1).max(1) + 1e-30
    return (np.abs(got - want).reshape(ncomp, -1).max(1) / sc).max()


def test_layout_inference_distinct():
    for name in ("elastic3d", "elastic2d", "acoustic3d", "acoustic2d"):
        m = get_model(name)
        heights = {len(mat_layout(m)), len(mat_layout(m, compact=True))}
        if name.startswith("elastic"):
            heights.add(len(ortho_mat_layout(m)))
        assert len(heights) == (3 if name.startswith("elastic") else 2), name
        assert infer_layout(m, len(mat_layout(m))) == "derived"
        assert infer_layout(m, len(mat_layout(m, True))) == "compact"


@pytest.mark.parametrize("compact", [False, True])
def test_fused3d_compact_layout_matches_jnp(compact, rng):
    shape = (16, 16, 16)
    model = get_model("elastic3d")
    mat, dt = _iso(rng, shape)
    u = _state(rng, model, shape)
    ms = stack_mats(model, mat, compact=compact)
    h = (1.0, 1.1, 0.9)
    got = fused_step(model, u, ms, dt, h, 2, B3, (0, 1, 2),
                     bx=4, by=8, interpret=True)
    want = step(model, u, mat, dt, h, 2, B3, (0, 1, 2))
    assert _err(got, want, model.ncomp) < 2e-6


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("axes", [(0, 1, 2), (2, 1, 0)])
def test_fused3d_orthotropic_matches_jnp(order, axes, rng):
    shape = (16, 16, 16)
    model = get_model("elastic3d")
    mat, dt = _ortho(rng, shape)
    u = _state(rng, model, shape)
    ms = stack_mats_ortho(model, mat)
    h = (1.0, 1.1, 0.9)
    got = fused_step(model, u, ms, dt, h, order, B3, axes,
                     bx=4, by=8, interpret=True)
    want = step(model, u, mat, dt, h, order, B3, axes)
    assert _err(got, want, model.ncomp) < 3e-6


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_slab_matches_jnp(order, rng):
    shape = (16, 12, 16)
    model = get_model("elastic3d")
    mat, dt = _iso(rng, shape)
    u = _state(rng, model, shape)
    ms = stack_mats(model, mat, compact=True)
    h = (1.0, 1.1, 0.9)
    for axes in ((0, 1, 2), (2, 1, 0)):
        got = fused_step_slab(model, u, ms, dt, h, order, B3, axes,
                              bx=4, interpret=True)
        want = step(model, u, mat, dt, h, order, B3, axes)
        assert _err(got, want, model.ncomp) < 2e-6


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("axes", [(0, 1), (1, 0)])
def test_fused2d_matches_jnp(order, axes, rng):
    shape = (24, 16)
    model = get_model("elastic2d")
    mat, dt = _iso(rng, shape)
    u = _state(rng, model, shape)
    ms = stack_mats(model, mat, compact=True)
    h = (1.0, 1.1)
    got = fused_step_2d(model, u, ms, dt, h, order, B2, axes,
                        bx=8, interpret=True)
    want = step(model, u, mat, dt, h, order, B2, axes)
    assert _err(got, want, model.ncomp) < 2e-6


def test_fused2d_orthotropic_matches_jnp(rng):
    shape = (24, 16)
    model = get_model("elastic2d")
    mat, dt = _ortho(rng, shape)
    u = _state(rng, model, shape)
    ms = stack_mats_ortho(model, mat)
    h = (1.0, 1.1)
    for axes in ((0, 1), (1, 0)):
        got = fused_step_2d(model, u, ms, dt, h, 2, B2, axes,
                            bx=8, interpret=True)
        want = step(model, u, mat, dt, h, 2, B2, axes)
        assert _err(got, want, model.ncomp) < 3e-6


def test_fused2d_acoustic_matches_jnp(rng):
    shape = (24, 16)
    model = get_model("acoustic2d")
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    lam = 2e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, 0.0 * lam,
                                     xp=jnp, dtype=jnp.float32)
    dt = 0.6 / float(np.sqrt(lam / rho).max())
    u = jnp.asarray(rng.standard_normal((model.ncomp,) + shape), jnp.float32)
    ms = stack_mats(model, mat, compact=True)
    got = fused_step_2d(model, u, ms, dt, (1.0, 1.1), 2,
                        {(0, 0): BorderSpec("absorbing"),
                         (1, 1): BorderSpec("free")}, (0, 1),
                        bx=8, interpret=True)
    want = step(model, u, mat, dt, (1.0, 1.1), 2,
                {(0, 0): BorderSpec("absorbing"),
                 (1, 1): BorderSpec("free")}, (0, 1))
    assert _err(got, want, model.ncomp) < 2e-6


def test_engine_2d_fused_kernel(rng):
    """Engine dispatches 2D tasks to the 2D fused kernel (no silent
    fallback) and matches the jnp engine."""
    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario

    orig = pf.pl.pallas_call
    import unittest.mock as mock

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pf.pl, "pallas_call", wrapped):
        task = get_scenario("elastic2d_ps", n=48, nsteps=6)
        e_ref = Engine(task)
        assert e_ref._mstack is None
        res_ref = e_ref.run()
        e_fus = Engine(dataclasses.replace(task, kernel="pallas_fused"))
        assert e_fus._mstack is not None and e_fus._fused_fn is pf.fused_step_2d
        res_fus = e_fus.run()
    scale = np.abs(res_ref.u).max() + 1e-30
    assert np.abs(res_fus.u - res_ref.u).max() / scale < 2e-5


def test_engine_3d_orthotropic_fused(rng):
    """Engine runs orthotropic 3D tasks on the fused kernel."""
    import unittest.mock as mock

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import OrthotropicMaterial
    from gcm_tpu.task import (
        AreaBall, GridSpec, InitialCondition, Task, TimeSpec)

    ortho = OrthotropicMaterial(
        rho=2500.0, c11=60e9, c12=12e9, c13=10e9, c22=45e9, c23=14e9,
        c33=70e9, c44=18e9, c55=22e9, c66=16e9)
    base = Task(
        name="ortho3d", model="elastic3d",
        grid=GridSpec(shape=(16, 16, 16), h=(1.0, 1.0, 1.0)),
        default_material=ortho,
        initial=(InitialCondition(AreaBall(center=(8.0, 8.0, 8.0), radius=3.0),
                                  values={"sxx": 1e6, "syy": 1e6, "szz": 1e6}),),
        borders={(a, s): BorderSpec("absorbing")
                 for a in range(3) for s in (0, 1)},
        time=TimeSpec(cfl=0.5, nsteps=4), order=2,
    )
    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pf.pl, "pallas_call", wrapped):
        res_ref = Engine(base).run()
        e = Engine(dataclasses.replace(base, kernel="pallas_fused"))
        assert e._mstack is not None
        res = e.run()
    scale = np.abs(res_ref.u).max() + 1e-30
    assert np.abs(res.u - res_ref.u).max() / scale < 2e-5
