"""Task-level richness: area shapes/combinators, function initial
conditions, plane-wave ICs, arbitrary wavelet sources (round-1 verdict
missing #6 — reference Task features, SURVEY.md §2 component 14)."""

import numpy as np
import pytest

from gcm_tpu.engine import Engine
from gcm_tpu.materials import IsotropicMaterial
from gcm_tpu.task import (
    AreaBall,
    AreaBox,
    AreaCylinder,
    AreaHalfSpace,
    AreaLayer,
    BorderSpec,
    GridSpec,
    InitialCondition,
    RickerSource,
    Task,
    TimeSpec,
    WaveletSource,
    plane_wave_initial,
)

ROCK = IsotropicMaterial.from_speeds(2500.0, 4000.0, 2300.0)


def test_area_combinators_and_new_shapes():
    grid = GridSpec(shape=(17, 17, 17), h=(1.0, 1.0, 1.0))
    cyl = AreaCylinder(axis=2, center=(8.0, 8.0, 0.0), radius=3.0,
                       lo=2.0, hi=14.0)
    m = cyl.mask(grid)
    assert m[8, 8, 8] and m[10, 8, 8]
    assert not m[13, 8, 8]           # outside radius
    assert not m[8, 8, 0]            # outside axial extent
    half = AreaHalfSpace(point=(8.0, 0.0, 0.0), normal=(1.0, 0.0, 0.0))
    hm = half.mask(grid)
    assert hm[:9].all() and not hm[9:].any()
    # combinators
    box = AreaBox((0, 0, 0), (8, 16, 16))
    ball = AreaBall((8.0, 8.0, 8.0), 4.0)
    u = (box | ball).mask(grid)
    assert u[2, 2, 2] and u[11, 8, 8]
    i = (box & ball).mask(grid)
    assert i[6, 8, 8] and not i[11, 8, 8]
    n = (~box).mask(grid)
    assert not n[2, 2, 2] and n[11, 8, 8]


def test_function_initial_condition():
    def gauss(X, Y, Z):
        return 1e6 * np.exp(-((X - 8.0) ** 2 + (Y - 8.0) ** 2
                              + (Z - 8.0) ** 2) / 8.0)

    task = Task(
        name="fic", model="elastic3d",
        grid=GridSpec(shape=(17, 17, 17), h=(1.0, 1.0, 1.0)),
        default_material=ROCK,
        initial=(InitialCondition(AreaBall((8.0,) * 3, 6.0),
                                  values={"sxx": gauss, "syy": 1e5}),),
        time=TimeSpec(cfl=0.5, nsteps=1),
    )
    eng = Engine(task)
    u0 = np.asarray(eng.u)
    m = eng.model
    X, Y, Z = task.grid.meshgrid()
    inside = AreaBall((8.0,) * 3, 6.0).mask(task.grid)
    np.testing.assert_allclose(
        u0[m.comp("sxx")][inside], gauss(X, Y, Z)[inside].astype(np.float32),
        rtol=1e-6)
    assert (u0[m.comp("sxx")][~inside] == 0).all()
    assert (u0[m.comp("syy")][inside] == 1e5).all()


@pytest.mark.parametrize("direction", [+1, -1])
def test_plane_wave_ic_travels_one_way(direction):
    n, h = 128, 1.0

    def prof(x):
        return 1e6 * np.exp(-((x - 64.0) ** 2) / 64.0)

    ic = plane_wave_initial("elastic2d", ROCK, axis=0,
                            direction=direction, profile=prof)
    # absorbing ends along the travel axis; FREE transverse faces (exact
    # for purely tangential motion — absorbing ones would drain the plane
    # wave's vx from the sides)
    borders = {(0, 0): BorderSpec("absorbing"),
               (0, 1): BorderSpec("absorbing"),
               (1, 0): BorderSpec("free"), (1, 1): BorderSpec("free")}
    task = Task(
        name="pw", model="elastic2d",
        grid=GridSpec(shape=(n, 8), h=(h, h)),
        default_material=ROCK,
        initial=(ic,),
        borders=borders,
        time=TimeSpec(cfl=0.5, nsteps=20),
        order=2,
    )
    eng = Engine(task)
    res = eng.run()
    sxx = np.asarray(res.u)[eng.model.comp("sxx")][:, 4]
    x_peak = np.argmax(np.abs(sxx)) * h
    travel = ROCK.cp * res.nsteps * res.dt
    expect = 64.0 + direction * travel
    assert abs(x_peak - expect) <= 2.0 * h
    # one-way: amplitude mostly preserved, and no counter-propagating
    # pulse on the opposite side
    assert np.abs(sxx).max() > 0.8 * 1e6
    # no counter-propagating pulse: beyond the traveling pulse's own tail
    # (3+ sigma behind the start) the field is empty
    wrong_side = (np.arange(n) * h - 64.0) * direction < -(travel / 2 + 16)
    assert wrong_side.any()
    assert np.abs(sxx[wrong_side]).max() < 0.02 * 1e6


def test_wavelet_source_generalizes_ricker():
    """WaveletSource(fn=ricker formula) == RickerSource, end to end."""
    f0, t0 = 40.0, 0.05

    def ricker(t):
        a = (np.pi * f0 * (t - t0)) ** 2
        return (1.0 - 2.0 * a) * np.exp(-a)

    def mk(src):
        return Task(
            name="src", model="elastic3d",
            grid=GridSpec(shape=(24, 24, 24), h=(10.0, 10.0, 10.0)),
            default_material=ROCK,
            borders={(a, s): BorderSpec("absorbing")
                     for a in range(3) for s in (0, 1)},
            sources=(src,),
            time=TimeSpec(cfl=0.5, nsteps=30),
        )

    pos = (120.0, 120.0, 120.0)
    comps = ("sxx", "syy", "szz")
    r1 = Engine(mk(RickerSource(pos, comps, f0=f0, t0=t0,
                                amplitude=1e6))).run()
    r2 = Engine(mk(WaveletSource(pos, comps, fn=ricker,
                                 amplitude=1e6))).run()
    np.testing.assert_allclose(r2.u, r1.u, rtol=1e-6, atol=1e-3)
    assert np.abs(r1.u).max() > 0
