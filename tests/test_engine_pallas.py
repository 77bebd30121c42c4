"""Engine with the pallas compute path (interpret mode) == jnp path."""

import dataclasses

import numpy as np
import pytest

import gcm_tpu.ops.pallas_stage as ps
from gcm_tpu.engine import Engine
from gcm_tpu.scenarios import get_scenario


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = ps.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", wrapped)
    yield


def test_engine_pallas_matches_jnp():
    task = get_scenario("elastic3d_layered", n=16, nsteps=6)
    res_jnp = Engine(task).run()
    res_pal = Engine(dataclasses.replace(task, kernel="pallas")).run()
    scale = np.abs(res_jnp.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res_pal.u - res_jnp.u).reshape(9, -1).max(1) / scale
    assert err.max() < 2e-5, err
    np.testing.assert_allclose(res_pal.traces, res_jnp.traces,
                               rtol=1e-3, atol=1e-5 * scale.max())


def test_orthotropic_pallas_matches_jnp(rng):
    """Per-pair distinct material fields exercise the dedup machinery."""
    import jax.numpy as jnp

    from gcm_tpu.materials import OrthotropicMaterialFields
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.solver.gcm import step
    from gcm_tpu.task import BorderSpec

    model = get_model("elastic3d")
    shape = (16, 16, 128)
    rho = 2000.0
    ortho = OrthotropicMaterialFields(
        *[jnp.broadcast_to(jnp.asarray(x, jnp.float32), shape) for x in (
            rho,
            rho * 4000.0**2, 0.3 * rho * 4000.0**2, 0.25 * rho * 4000.0**2,
            rho * 3000.0**2, 0.2 * rho * 3000.0**2, rho * 3500.0**2,
            rho * 1500.0**2, rho * 1800.0**2, rho * 2000.0**2,
        )])
    u0 = rng.standard_normal((model.ncomp,) + shape).astype(np.float32)
    u0[3:] *= 1e6
    u = jnp.asarray(u0)
    h = (1.0, 1.0, 1.0)
    dt = 0.5 / 4000.0
    borders = {(a, s): BorderSpec("absorbing") for a in range(3)
               for s in (0, 1)}
    want = np.asarray(step(model, u, ortho, dt, h, 2, borders))
    got = np.asarray(ps.pallas_step(model, u, ortho, dt, h, 2, borders,
                                    cx=8))
    scale = np.abs(want).reshape(model.ncomp, -1).max(1) + 1e-30
    err = np.abs(got - want).reshape(model.ncomp, -1).max(1) / scale
    assert err.max() < 2e-6, err


def test_engine_temporal_pair_path(monkeypatch):
    """A detector/source/corrector-free fused-kernel task runs the scan on
    the temporally blocked pair kernel (one HBM pass per symmetrized pair)
    and matches the jnp engine (VERDICT r3 item 1)."""
    import dataclasses

    import numpy as np

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    task = dataclasses.replace(
        get_scenario("elastic3d_layered", n=16, nsteps=6), detectors=None,
        temporal_block=True)
    ref = Engine(task).run()
    eng = Engine(dataclasses.replace(task, kernel="pallas_fused"))
    res = eng.run()
    assert eng._pair_fused, "pair path must be selected for this task"
    scale = np.abs(ref.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - ref.u).reshape(9, -1).max(1) / scale
    assert err.max() < 1e-5, err

    # detectors force the per-step body (mid-pair samples must exist)
    eng_det = Engine(dataclasses.replace(
        get_scenario("elastic3d_layered", n=16, nsteps=6),
        kernel="pallas_fused", temporal_block=True))
    eng_det._build_scan()
    assert not eng_det._pair_fused


def test_engine_canonical_layout_unlocks_fused(monkeypatch):
    """Task.canonical_layout on a lane-misaligned shape (nz=48) stores the
    state permuted so the 128-aligned axis is last, unlocking the fused
    kernel; results must match the jnp semantics of record run with the
    matching physical splitting order, in TASK layout."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.gcm import step as jnp_step
    from gcm_tpu.task import (
        AreaBall, BorderSpec, DetectorSpec, GridSpec, InitialCondition,
        Task, TimeSpec,
    )

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    mat = IsotropicMaterial.from_speeds(rho=2000.0, cp=3000.0, cs=1500.0)
    shape = (128, 12, 10)     # lane dim 10: fused-ineligible in task layout
    task = Task(
        name="canon", model="elastic3d",
        grid=GridSpec(shape, (10.0, 10.0, 10.0)),
        default_material=mat,
        initial=(InitialCondition(
            AreaBall(center=(640.0, 60.0, 50.0), radius=40.0),
            {"sxx": 1e6, "syy": 1e6, "szz": 1e6}),),
        borders={**{(a, s): BorderSpec("absorbing")
                    for a in range(3) for s in (0, 1)},
                 (2, 0): BorderSpec("free")},
        detectors=DetectorSpec(points=((320.0, 60.0, 50.0),)),
        time=TimeSpec(cfl=0.7, nsteps=4), order=2,
        kernel="pallas_fused", canonical_layout=True,
    )
    eng = Engine(task)
    assert eng._perm == (1, 2, 0), eng._perm
    res = eng.run()

    # reference: jnp path in task layout with the matching physical order
    ref = Engine(dataclasses.replace(task, kernel="jnp",
                                     canonical_layout=False))
    u = ref.u
    for n in range(task.time.nsteps):
        axes = (1, 2, 0) if n % 2 == 0 else (0, 2, 1)
        u = jnp_step(ref.model, u, ref.mat, ref.dt, task.grid.h, 2,
                     dict(task.borders), axes)
    want = np.asarray(u)
    scale = np.abs(want).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - want).reshape(9, -1).max(1) / scale
    assert err.max() < 1e-5, err
    assert res.traces.shape[0] == task.time.nsteps

    # checkpoint boundary stays in task layout + resume == uninterrupted
    sd = eng.state_dict()
    assert sd["u"].shape == (9,) + shape
    part = Engine(task)
    part.nsteps = 2
    part.run()
    resumed = Engine(task)
    resumed.load_state(part.state_dict())
    rres = resumed.run()
    err2 = np.abs(rres.u - res.u).reshape(9, -1).max(1) / scale
    assert err2.max() < 1e-5, err2


def test_engine_canonical_layout_2d(monkeypatch):
    """2D canonical layout: a (256, 40) task (lane-misaligned) stores as
    (40, 256) and runs the fused 2D kernel; matches the jnp path with the
    matching (1,0)/(0,1) physical order."""
    import dataclasses

    import numpy as np

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.gcm import step as jnp_step
    from gcm_tpu.task import (
        AreaBall, BorderSpec, GridSpec, InitialCondition, Task, TimeSpec,
    )

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    mat = IsotropicMaterial.from_speeds(rho=2000.0, cp=3000.0, cs=1500.0)
    task = Task(
        name="canon2d", model="elastic2d",
        grid=GridSpec((256, 40), (10.0, 10.0)),
        default_material=mat,
        initial=(InitialCondition(
            AreaBall(center=(1280.0, 200.0), radius=60.0),
            {"sxx": 1e6, "syy": 1e6}),),
        borders={(a, s): BorderSpec("absorbing")
                 for a in range(2) for s in (0, 1)},
        time=TimeSpec(cfl=0.7, nsteps=4), order=2,
        kernel="pallas_fused", canonical_layout=True,
    )
    eng = Engine(task)
    assert eng._perm == (1, 0)
    res = eng.run()

    ref = Engine(dataclasses.replace(task, kernel="jnp",
                                     canonical_layout=False))
    u = ref.u
    for n in range(task.time.nsteps):
        axes = (1, 0) if n % 2 == 0 else (0, 1)
        u = jnp_step(ref.model, u, ref.mat, ref.dt, task.grid.h, 2,
                     dict(task.borders), axes)
    want = np.asarray(u)
    scale = np.abs(want).reshape(5, -1).max(1) + 1e-30
    err = np.abs(res.u - want).reshape(5, -1).max(1) / scale
    assert err.max() < 1e-5, err


def test_engine_spmd_folds_correctors(monkeypatch):
    """Engine(mesh=...) with a source-free viscoelastic+damage task folds
    the correctors into the spmd kernels and matches the unsharded jnp
    engine."""
    import dataclasses

    import numpy as np

    import gcm_tpu.ops.pallas_fused as pfu
    import gcm_tpu.parallel.fused_spmd as pfs
    from gcm_tpu.engine import Engine
    from gcm_tpu.parallel.sharding import domain_mesh
    from gcm_tpu.scenarios import get_scenario
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector

    for mod in (pfu, pfs):
        orig = mod.pl.pallas_call

        def wrapped(*a, _orig=orig, **k):
            k.setdefault("interpret", True)
            return _orig(*a, **k)

        monkeypatch.setattr(mod.pl, "pallas_call", wrapped)

    import jax

    base = dataclasses.replace(
        get_scenario("elastic3d_layered", n=16, nsteps=6), detectors=None,
        correctors=(MaxwellCorrector(tau=1e-3),
                    DamageCorrector(threshold=3e5, rate=1.0)))
    ref = Engine(base).run()
    mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
    eng = Engine(dataclasses.replace(base, kernel="pallas_fused"),
                 mesh=mesh)
    assert eng._spmd_fold_specs is not None
    res = eng.run()
    scale = np.abs(ref.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - ref.u).reshape(9, -1).max(1) / scale
    assert err.max() < 1e-5, err


def test_engine_canonical_ortho_guard():
    """canonical_layout must NOT permute orthotropic media: the ortho
    stack's axis-keyed fields would read the permuted sweep axis as a
    physical axis — the engine falls back to task layout (advisor r4)."""
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import IsotropicMaterial, OrthotropicMaterial
    from gcm_tpu.task import BorderSpec, GridSpec, Task, TimeSpec

    mat = OrthotropicMaterial.from_isotropic(
        IsotropicMaterial.from_speeds(rho=2000.0, cp=3000.0, cs=1500.0))
    task = Task(
        name="canon_ortho", model="elastic3d",
        grid=GridSpec((128, 12, 10), (10.0, 10.0, 10.0)),
        default_material=mat,
        borders={(a, s): BorderSpec("absorbing")
                 for a in range(3) for s in (0, 1)},
        time=TimeSpec(cfl=0.7, nsteps=2), order=2,
        kernel="pallas_fused", canonical_layout=True,
    )
    eng = Engine(task)
    assert eng._perm is None


def test_engine_canonical_temporal_block(monkeypatch):
    """canonical_layout + temporal_block: the pair-fused body drives the
    permuted slab shim with axes_seq only (no positional axes) — must run
    and match the jnp reference with the permuted physical order."""
    import dataclasses

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.gcm import step as jnp_step
    from gcm_tpu.task import (
        AreaBall, BorderSpec, GridSpec, InitialCondition, Task, TimeSpec,
    )

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    mat = IsotropicMaterial.from_speeds(rho=2000.0, cp=3000.0, cs=1500.0)
    shape = (128, 12, 10)
    task = Task(
        name="canon_tb", model="elastic3d",
        grid=GridSpec(shape, (10.0, 10.0, 10.0)),
        default_material=mat,
        initial=(InitialCondition(
            AreaBall(center=(640.0, 60.0, 50.0), radius=40.0),
            {"sxx": 1e6, "syy": 1e6, "szz": 1e6}),),
        borders={(a, s): BorderSpec("absorbing")
                 for a in range(3) for s in (0, 1)},
        time=TimeSpec(cfl=0.7, nsteps=4), order=2,
        kernel="pallas_fused", canonical_layout=True, temporal_block=True,
    )
    eng = Engine(task)
    assert eng._perm == (1, 2, 0)
    eng._build_scan()
    assert eng._pair_fused
    res = eng.run()

    ref = Engine(dataclasses.replace(task, kernel="jnp",
                                     canonical_layout=False,
                                     temporal_block=False))
    u = ref.u
    for n in range(task.time.nsteps):
        axes = (1, 2, 0) if n % 2 == 0 else (0, 2, 1)
        u = jnp_step(ref.model, u, ref.mat, ref.dt, task.grid.h, 2,
                     dict(task.borders), axes)
    want = np.asarray(u)
    scale = np.abs(want).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - want).reshape(9, -1).max(1) / scale
    assert err.max() < 1e-5, err
