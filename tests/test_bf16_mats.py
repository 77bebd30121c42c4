"""bf16 material stacks on the fused kernels (VERDICT r2 item 8).

The static material stack is the second-largest HBM stream of the fused
full-step kernel (~20 of ~117 B/pt); storing it bf16 halves that stream.
All sweep arithmetic stays f32 — kernels upcast the material windows right
after the DMA — so the only perturbation is the one-time rounding of the
material fields to 8-bit mantissa (~4e-3 relative). These tests pin that
contract: bf16-vs-f32 deviation on heterogeneous media stays at the
material-rounding level, and is exactly zero when the material fields are
bf16-representable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.ops.pallas_fused import fused_step, fused_step_2d, stack_mats


def _interpret(monkeypatch):
    import gcm_tpu.ops.pallas_fused as pf

    orig = pf.pl.pallas_call

    def wrapped(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pf.pl, "pallas_call", wrapped)


def _problem(rng, shape, dim, exact_bf16=False):
    model = get_model(f"elastic{dim}d")
    if exact_bf16:
        # fields chosen so rho, cp, cs, kappa are bf16-representable
        rho = np.full(shape, 1024.0)
        cs = np.full(shape, 1024.0)
        cp = np.full(shape, 2048.0)
        mu = rho * cs**2
        lam = rho * cp**2 - 2 * mu          # kappa = lam/(lam+2mu) = 0.5
    else:
        rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
        mu = 1e9 * (0.5 + rng.random(shape))
        lam = 1e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    u0 = rng.standard_normal((model.ncomp,) + shape)
    u0[dim:] *= 1e6
    dt = 0.6 / float(np.sqrt((lam + 2 * mu) / rho).max())
    return model, jnp.asarray(u0, dtype=jnp.float32), mat, dt


@pytest.mark.parametrize("dim", [2, 3])
def test_bf16_mats_deviation_is_rounding_level(dim, rng, monkeypatch):
    _interpret(monkeypatch)
    shape = (16, 16, 8)[:dim] if dim == 3 else (16, 16)
    model, u, mat, dt = _problem(rng, shape, dim)
    h = (1.0,) * dim
    mstack = stack_mats(model, mat, compact=True)
    fn = fused_step if dim == 3 else fused_step_2d
    kw = dict(bx=8) if dim == 2 else dict(bx=8, by=8)
    f32 = fn(model, u, mstack, dt, h, 2, None, None, **kw)
    b16 = fn(model, u, mstack.astype(jnp.bfloat16), dt, h, 2, None, None,
             **kw)
    scale = float(np.abs(np.asarray(f32)).max()) + 1e-30
    rel = float(np.abs(np.asarray(b16) - np.asarray(f32)).max()) / scale
    # one step, ~4e-3 material rounding -> same-order state deviation
    assert rel < 3e-2, rel
    assert rel > 0.0   # bf16 genuinely flowed (fields are not representable)


@pytest.mark.parametrize("dim", [2, 3])
def test_bf16_exact_when_materials_representable(dim, rng, monkeypatch):
    """With bf16-representable material fields the bf16 stack is lossless:
    the two paths agree to f32-ulp level (the upcast shifts XLA fusion
    boundaries, so bitwise equality is not guaranteed — but any *material*
    information loss would show up orders of magnitude above 1 ulp).
    Proves only the material STREAM is narrowed; arithmetic stays f32."""
    _interpret(monkeypatch)
    shape = (16, 16, 8)[:dim] if dim == 3 else (16, 16)
    model, u, mat, dt = _problem(rng, shape, dim, exact_bf16=True)
    h = (1.0,) * dim
    mstack = stack_mats(model, mat, compact=True)
    assert bool((mstack.astype(jnp.bfloat16).astype(jnp.float32)
                 == mstack).all())   # the stack itself is lossless
    fn = fused_step if dim == 3 else fused_step_2d
    kw = dict(bx=8) if dim == 2 else dict(bx=8, by=8)
    f32 = np.asarray(fn(model, u, mstack, dt, h, 2, None, None, **kw))
    b16 = np.asarray(fn(model, u, mstack.astype(jnp.bfloat16), dt, h, 2,
                        None, None, **kw))
    scale = np.abs(f32).max() + 1e-30
    assert np.abs(b16 - f32).max() / scale < 1e-6


def test_task_mat_dtype_flows_to_engine(rng, monkeypatch):
    _interpret(monkeypatch)
    from gcm_tpu.engine import Engine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.task import (
        AreaAll, BorderSpec, GridSpec, InitialCondition, Task, TimeSpec)

    mat = IsotropicMaterial(rho=1024.0, lam=1024.0 * 2048.0**2 - 2 * 1024.0**3,
                            mu=1024.0**3)
    ic = InitialCondition(AreaAll(), values={
        "sxx": lambda X, Y: 1e6 * np.exp(
            -(((X - 8.0) ** 2 + (Y - 8.0) ** 2) / 3.0 ** 2))})
    borders = {(a, s): BorderSpec("absorbing") for a in range(2)
               for s in (0, 1)}
    task = Task(name="b16", model="elastic2d",
                grid=GridSpec((16, 16), (1.0, 1.0)),
                default_material=mat, initial=(ic,), borders=borders,
                time=TimeSpec(cfl=0.8, nsteps=2), order=2,
                kernel="pallas_fused", mat_dtype="bf16")
    eng = Engine(task)
    assert eng._mstack.dtype == jnp.bfloat16
    u_b16 = eng.run().u
    eng32 = Engine(dataclasses.replace(task, mat_dtype="f32"))
    u_f32 = eng32.run().u
    # representable material: ulp-level agreement (see above)
    scale = np.abs(u_f32).max() + 1e-30
    assert np.abs(u_b16 - u_f32).max() / scale < 1e-6


def test_bf16_slab_folds_correctors(rng, monkeypatch):
    """bf16 stacks route through the slab kernel, which now folds the ODE
    correctors too (VERDICT r4 weak #4): with bf16-representable material
    fields the single-pass bf16 viscoelastic/damage step agrees with the
    jnp step + separate corrector passes at f32-ulp level."""
    _interpret(monkeypatch)
    from gcm_tpu.ops.pallas_fused import fold_corrector_specs
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector
    from gcm_tpu.solver.gcm import step
    from gcm_tpu.task import BorderSpec

    shape = (16, 16, 8)
    model, u0, mat, dt = _problem(rng, shape, 3, exact_bf16=True)
    h = (1.0, 1.0, 1.0)
    borders = {(a, s): BorderSpec("absorbing") for a in range(3)
               for s in (0, 1)}
    corr = (MaxwellCorrector(tau=40 * dt),
            DamageCorrector(threshold=2e5, rate=0.5 / dt))
    specs, naux = fold_corrector_specs(corr, dt)
    assert specs is not None and naux == 1
    ms16 = stack_mats(model, mat, compact=True).astype(jnp.bfloat16)
    got, gaux = u0, jnp.zeros((1,) + shape, jnp.float32)
    want, waux = u0, {"damage": jnp.zeros(shape, jnp.float32)}
    for n in range(3):
        axes = (0, 1, 2) if n % 2 == 0 else (2, 1, 0)
        got, gaux = fused_step(model, got, ms16, dt, h, 2, borders, axes,
                               correctors=specs, aux=gaux)
        want = step(model, want, mat, dt, h, 2, borders, axes)
        for c in corr:
            want, waux = c(model, want, waux, dt)
    assert float(jnp.asarray(gaux).max()) > 1e-4
    scale = np.abs(np.asarray(want)).reshape(model.ncomp, -1).max(1) + 1e-30
    err = (np.abs(np.asarray(got) - np.asarray(want))
           .reshape(model.ncomp, -1).max(1)) / scale
    assert err.max() < 1e-5, err
    np.testing.assert_allclose(np.asarray(gaux[0]),
                               np.asarray(waux["damage"]),
                               rtol=1e-5, atol=1e-6)


def test_engine_bf16_viscoelastic_folds(rng, monkeypatch):
    """A bf16 viscoelastic task folds correctors in-kernel (engine gating
    no longer excludes bf16) and matches the f32 jnp engine at the
    material-representability tolerance."""
    _interpret(monkeypatch)
    import gcm_tpu.ops.pallas_fused  # noqa: F401
    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario
    from gcm_tpu.solver.correctors import MaxwellCorrector

    base = dataclasses.replace(
        get_scenario("elastic3d_layered", n=16, nsteps=4),
        detectors=None, correctors=(MaxwellCorrector(tau=1e-3),))
    ref = Engine(base).run()
    eng = Engine(dataclasses.replace(base, kernel="pallas_fused",
                                     mat_dtype="bf16"))
    assert eng._fold_specs is not None
    res = eng.run()
    scale = np.abs(ref.u).reshape(9, -1).max(1) + 1e-30
    err = np.abs(res.u - ref.u).reshape(9, -1).max(1) / scale
    # bf16 material rounding (~4e-3) over 4 steps
    assert err.max() < 5e-2, err
