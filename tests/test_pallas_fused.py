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


# ------------------------------------------------- temporal blocking (K steps)

@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_pair_matches_two_singles(rng, order):
    """Temporal blocking (VERDICT r3 item 1): one axes_seq=((0,1,2),(2,1,0))
    kernel call — the engine's symmetrized pair in ONE HBM pass — must
    reproduce two single-step fused calls exactly, including the border
    conditions at every domain face (the intermediate step applies BCs at
    offset r inside the window and re-patches the shrinking halo)."""
    from gcm_tpu.ops.pallas_fused import fused_step

    shape = (12, 24, 16)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 12.0, 9.0)
    ms = stack_mats(model, mat, compact=True)
    want = fused_step(model, u0, ms, dt, h, order, BORDERS, (0, 1, 2),
                      bx=4, by=8, interpret=True)
    want = fused_step(model, want, ms, dt, h, order, BORDERS, (2, 1, 0),
                      bx=4, by=8, interpret=True)
    got = fused_step(model, u0, ms, dt, h, order, BORDERS,
                     axes_seq=((0, 1, 2), (2, 1, 0)),
                     bx=4, by=8, interpret=True)
    # not bitwise: XLA fuses/contracts the two programs differently (FMA),
    # so identical op sequences differ by ulps; the normalized tolerance is
    # the same standard the single-step-vs-jnp tests use
    _compare(model, got, want, tol=2e-6)


def test_fused_pair_matches_jnp_pair(rng):
    """The pair kernel against the jnp semantics of record over 2 pairs."""
    shape = (12, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    ms = stack_mats(model, mat, compact=True)
    want, got = u0, u0
    for _ in range(2):
        want = step(model, want, mat, dt, h, 2, BORDERS, (0, 1, 2))
        want = step(model, want, mat, dt, h, 2, BORDERS, (2, 1, 0))
        got = fused_step(model, got, ms, dt, h, 2, BORDERS,
                         axes_seq=((0, 1, 2), (2, 1, 0)),
                         bx=4, by=8, interpret=True)
    _compare(model, got, want, tol=5e-6)


def test_fused_slab_pair_matches_two_singles(rng):
    from gcm_tpu.ops.pallas_fused import fused_step_slab

    shape = (12, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 11.0, 12.0)
    ms = stack_mats(model, mat, compact=True)
    want = fused_step_slab(model, u0, ms, dt, h, 2, BORDERS, (0, 1, 2),
                           bx=4, interpret=True)
    want = fused_step_slab(model, want, ms, dt, h, 2, BORDERS, (2, 1, 0),
                           bx=4, interpret=True)
    got = fused_step_slab(model, u0, ms, dt, h, 2, BORDERS,
                          axes_seq=((0, 1, 2), (2, 1, 0)),
                          bx=4, interpret=True)
    _compare(model, got, want, tol=2e-6)


def test_fused_2d_pair_matches_two_singles(rng):
    from gcm_tpu.ops.pallas_fused import fused_step_2d

    shape = (32, 24)
    model, u0, mat, dt = _problem(rng, shape, name="elastic2d")
    h = (10.0, 11.0)
    borders = {(0, 0): BorderSpec("free"), (0, 1): BorderSpec("absorbing"),
               (1, 0): BorderSpec("fixed_force", value=(1e5, -2e5)),
               (1, 1): BorderSpec("fixed_velocity", value=(0.1, -0.2))}
    ms = stack_mats(model, mat, compact=True)
    want = fused_step_2d(model, u0, ms, dt, h, 2, borders, (0, 1),
                         bx=8, interpret=True)
    want = fused_step_2d(model, want, ms, dt, h, 2, borders, (1, 0),
                         bx=8, interpret=True)
    got = fused_step_2d(model, u0, ms, dt, h, 2, borders,
                        axes_seq=((0, 1), (1, 0)),
                        bx=8, interpret=True)
    _compare(model, got, want, tol=2e-6)


def test_fused_quad_matches_four_singles(rng):
    """K=4 (two symmetrized pairs per HBM pass) also holds exactly."""
    shape = (16, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    ms = stack_mats(model, mat, compact=True)
    seq = ((0, 1, 2), (2, 1, 0), (0, 1, 2), (2, 1, 0))
    want = u0
    for ax in seq:
        want = fused_step(model, want, ms, dt, h, 1, BORDERS, ax,
                          bx=4, by=8, interpret=True)
    got = fused_step(model, u0, ms, dt, h, 1, BORDERS, axes_seq=seq,
                     bx=4, by=8, interpret=True)
    _compare(model, got, want, tol=4e-6)


# --------------------------------------------- corrector folding (r3 item 8)

def test_fused_corrector_epilogue_matches_jnp(rng):
    """Maxwell + damage folded into the kernel's output tile == the jnp
    step followed by the corrector passes (VERDICT r3 item 8)."""
    from gcm_tpu.ops.pallas_fused import fold_corrector_specs, fused_step
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector

    shape = (12, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    corr = (MaxwellCorrector(tau=40 * dt),
            DamageCorrector(threshold=2e5, rate=0.5 / dt))
    specs, naux = fold_corrector_specs(corr, dt)
    assert specs is not None and naux == 1
    ms = stack_mats(model, mat, compact=True)
    aux = {"damage": jnp.zeros(shape, jnp.float32)}
    got, gaux = u0, jnp.stack([aux["damage"]])
    want, waux = u0, dict(aux)
    for n in range(3):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got, gaux = fused_step(model, got, ms, dt, h, 2, BORDERS, axes,
                               bx=4, by=8, interpret=True,
                               correctors=specs, aux=gaux)
        want = step(model, want, mat, dt, h, 2, BORDERS, axes)
        for c in corr:
            want, waux = c(model, want, waux, dt)
    assert float(jnp.asarray(gaux).max()) > 1e-4, \
        "test must exercise nontrivial damage"
    _compare(model, got, want, tol=2e-6)
    # atol absorbs threshold-crossing knife-edges in max(smax - thr, 0)
    np.testing.assert_allclose(np.asarray(gaux[0]),
                               np.asarray(waux["damage"]),
                               rtol=1e-5, atol=1e-6)


def test_fused_corrector_epilogue_2d(rng):
    from gcm_tpu.ops.pallas_fused import fold_corrector_specs, fused_step_2d
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector

    shape = (32, 24)
    model, u0, mat, dt = _problem(rng, shape, name="elastic2d")
    h = (10.0, 11.0)
    corr = (MaxwellCorrector(tau=40 * dt),
            DamageCorrector(threshold=2e5, rate=0.5 / dt))
    specs, naux = fold_corrector_specs(corr, dt)
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(2) for s in (0, 1)}
    ms = stack_mats(model, mat, compact=True)
    got, gaux = u0, jnp.zeros((1,) + shape, jnp.float32)
    want, waux = u0, {"damage": jnp.zeros(shape, jnp.float32)}
    for n in range(3):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        got, gaux = fused_step_2d(model, got, ms, dt, h, 2, borders, axes,
                                  bx=8, interpret=True,
                                  correctors=specs, aux=gaux)
        want = step(model, want, mat, dt, h, 2, borders, axes)
        for c in corr:
            want, waux = c(model, want, waux, dt)
    _compare(model, got, want, tol=2e-6)
    # atol absorbs threshold-crossing knife-edges in max(smax - thr, 0)
    np.testing.assert_allclose(np.asarray(gaux[0]),
                               np.asarray(waux["damage"]),
                               rtol=1e-5, atol=1e-6)


def test_engine_folds_correctors(monkeypatch):
    """A source-free viscoelastic task on the fused path folds correctors
    in-kernel and matches the jnp engine."""
    import dataclasses

    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario
    from gcm_tpu.solver.correctors import MaxwellCorrector

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)

    base = dataclasses.replace(
        get_scenario("elastic3d_layered", n=16, nsteps=6),
        detectors=None, correctors=(MaxwellCorrector(tau=1e-3),))
    ref = Engine(base).run()
    eng = Engine(dataclasses.replace(base, kernel="pallas_fused"))
    assert eng._fold_specs is not None
    res = eng.run()
    scale = np.abs(ref.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - ref.u).reshape(9, -1).max(1) / scale
    assert err.max() < 1e-5, err


# ------------------------------------------------ guard rails (advisor r4)

def test_fused_tile_smaller_than_halo_raises(rng):
    """Tiles below the halo would make non-edge tiles read clamped
    in-bounds-but-wrong rows that the edge patch never fixes — the kernels
    must refuse instead of silently corrupting boundary-adjacent results."""
    shape = (8, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    h = (10.0, 10.0, 10.0)
    ms = stack_mats(model, mat, compact=True)
    seq = ((0, 1, 2), (2, 1, 0))      # K=2, order 2 -> halo = 2
    with pytest.raises(ValueError, match="halo"):
        fused_step(model, u0, ms, dt, h, 2, BORDERS, axes_seq=seq,
                   bx=1, by=8, interpret=True)
    from gcm_tpu.ops.pallas_fused import fused_step_slab

    with pytest.raises(ValueError, match="halo"):
        fused_step_slab(model, u0, ms, dt, h, 2, BORDERS, axes_seq=seq,
                        bx=1, interpret=True)


def test_fused_correctors_with_temporal_blocking_raises(rng):
    """Folded correctors are split-step (per-step) semantics; one epilogue
    after K>1 in-window steps would silently diverge — refuse."""
    from gcm_tpu.ops.pallas_fused import fused_step_2d

    shape = (12, 16, 8)
    model, u0, mat, dt = _problem(rng, shape)
    ms = stack_mats(model, mat, compact=True)
    seq = ((0, 1, 2), (2, 1, 0))
    with pytest.raises(ValueError, match="corrector"):
        fused_step(model, u0, ms, dt, (10.0,) * 3, 2, BORDERS,
                   axes_seq=seq, bx=4, by=8, interpret=True,
                   correctors=(("maxwell", 0.9),))
    model2, u2, mat2, dt2 = _problem(rng, (32, 24), name="elastic2d")
    ms2 = stack_mats(model2, mat2, compact=True)
    with pytest.raises(ValueError, match="corrector"):
        fused_step_2d(model2, u2, ms2, dt2, (10.0, 10.0), 2, None,
                      axes_seq=((0, 1), (1, 0)), bx=8, interpret=True,
                      correctors=(("maxwell", 0.9),))
