"""IO tests: VTK writers round-trip, seismograms, checkpoint/resume."""

import os
import re
import struct

import numpy as np
import pytest

from gcm_tpu.snapshot.vtk import write_vti, write_vtu
from gcm_tpu.snapshot.seismo import save_seismograms


def _read_appended(path):
    """Minimal parser for our own raw-appended VTK output."""
    raw = open(path, "rb").read()
    m = re.search(rb'<AppendedData encoding="raw">\s*_', raw)
    blob = raw[m.end():]
    arrays = {}
    for tag in re.finditer(
        rb'<DataArray type="(\w+)" Name="([^"]+)" NumberOfComponents="(\d+)" '
        rb'format="appended" offset="(\d+)"/>', raw
    ):
        t, name, ncomp, off = tag.groups()
        off = int(off)
        (nbytes,) = struct.unpack_from("<Q", blob, off)
        data = blob[off + 8: off + 8 + nbytes]
        dtype = {b"Float32": "<f4", b"Int64": "<i8", b"UInt8": "u1"}[t]
        arrays[name.decode()] = np.frombuffer(data, dtype=dtype)
    return arrays


def test_vti_roundtrip(tmp_path):
    shape = (4, 3, 2)
    rng = np.random.default_rng(0)
    scalar = rng.standard_normal(shape).astype(np.float32)
    vec = rng.standard_normal((3,) + shape).astype(np.float32)
    p = str(tmp_path / "t.vti")
    write_vti(p, shape, (1.0, 2.0, 3.0), (0.0, 0.0, 0.0),
              {"s": scalar, "velocity": vec})
    arrays = _read_appended(p)
    # x-fastest (Fortran) point order
    np.testing.assert_array_equal(
        arrays["s"], scalar.ravel(order="F"))
    got_vec = arrays["velocity"].reshape(-1, 3)
    want = np.stack([c.ravel(order="F") for c in vec], axis=-1)
    np.testing.assert_array_equal(got_vec, want)


def test_vtu_roundtrip(tmp_path):
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    cells = np.array([[0, 1, 2], [1, 3, 2]])
    vals = np.arange(4, dtype=np.float32)
    p = str(tmp_path / "t.vtu")
    write_vtu(p, pts, cells, {"f": vals})
    arrays = _read_appended(p)
    np.testing.assert_array_equal(arrays["f"], vals)
    np.testing.assert_array_equal(arrays["connectivity"], cells.ravel())
    np.testing.assert_array_equal(arrays["offsets"], [3, 6])
    np.testing.assert_array_equal(arrays["types"], [5, 5])
    pts3 = arrays["Points"].reshape(-1, 3)
    np.testing.assert_array_equal(pts3[:, :2], pts)


def test_seismogram_outputs(tmp_path):
    tr = np.random.default_rng(1).standard_normal((10, 2, 5)).astype(np.float32)
    save_seismograms(str(tmp_path), "test", tr, 0.01,
                     [(1.0, 2.0), (3.0, 4.0)], ["a", "b", "c", "d", "e"])
    d = np.load(tmp_path / "test.npz")
    np.testing.assert_array_equal(d["traces"], tr)
    flat = np.fromfile(tmp_path / "test.bin", dtype="<f4")
    np.testing.assert_array_equal(flat, tr.ravel())


def _damage_task(nsteps):
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.correctors import DamageCorrector
    from gcm_tpu.task import (
        AreaBox, BorderSpec, GridSpec, InitialCondition, RickerSource, Task,
        TimeSpec,
    )

    mat = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)
    return Task(
        name="resume_test",
        model="elastic2d",
        grid=GridSpec((24, 20), (1.0, 1.0)),
        default_material=mat,
        initial=(InitialCondition(AreaBox((8.0, 6.0), (14.0, 12.0)),
                                  {"sxx": 0.4, "syy": 0.4}),),
        borders={(a, s): BorderSpec("absorbing")
                 for a in range(2) for s in (0, 1)},
        sources=(RickerSource((12.0, 10.0), ("sxx", "syy"),
                              f0=200.0, t0=0.004, amplitude=50.0),),
        time=TimeSpec(cfl=0.8, nsteps=nsteps),
        correctors=(DamageCorrector(threshold=0.05, rate=5e4),),
    )


@pytest.mark.parametrize("cut", [6, 7])  # period-aligned and mid-period
def test_engine_resume_equals_uninterrupted(tmp_path, cut):
    """Kill-and-resume must reproduce the uninterrupted run, including the
    irreversible damage aux state (a resume that drops aux silently heals
    the material — VERDICT r1 item 3)."""
    from gcm_tpu.engine import Engine
    from gcm_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    nsteps = 12
    full = Engine(_damage_task(nsteps))
    full.run()
    assert float(np.asarray(full.aux["damage"]).max()) > 0.01, \
        "test must exercise nontrivial damage"

    part = Engine(_damage_task(nsteps))
    part.nsteps = cut                     # simulate interruption at `cut`
    part.run()
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, cut, part.state_dict())

    resumed = Engine(_damage_task(nsteps))
    resumed.load_state(restore_checkpoint(ckdir, resumed.state_dict()))
    assert resumed.start_step == cut
    res = resumed.run()
    assert resumed._done_step == nsteps
    np.testing.assert_allclose(res.u, np.asarray(full.u),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(resumed.aux["damage"]),
                               np.asarray(full.aux["damage"]),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("cut", [20, 21])  # period-aligned and odd
def test_multibody_resume_preserves_fracture(tmp_path, cut):
    """Resuming a fracture run must restore the bond masks: a dropped mask
    would re-glue broken interfaces. Odd-step checkpoints realign with a
    single forward step (VERDICT r3 weak #6)."""
    from gcm_tpu.engine_multi import MultiBodyEngine
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.contact import ContactSpec
    from gcm_tpu.task import (
        AreaBox, BorderSpec, GridSpec, InitialCondition, Task, TimeSpec,
    )
    from gcm_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    mat = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0)
    z = mat.rho * mat.cp
    nsteps = 40

    def bodies():
        # right-going tensile pulse in body a; interface with b fractures
        a = Task(
            name="a", model="elastic1d",
            grid=GridSpec((60,), (1.0,)),
            default_material=mat,
            initial=(InitialCondition(AreaBox((30.0,), (40.0,)),
                                      {"sxx": 0.2, "v": -0.2 / z}),),
            borders={(0, 0): BorderSpec("absorbing")},
            time=TimeSpec(cfl=0.9, nsteps=nsteps), order=1,
        )
        b = Task(
            name="b", model="elastic1d",
            grid=GridSpec((60,), (1.0,)),
            default_material=mat,
            borders={(0, 1): BorderSpec("absorbing")},
            time=TimeSpec(cfl=0.9, nsteps=nsteps), order=1,
        )
        contact = ContactSpec("a", "b", axis=0, kind="bonded",
                              tensile_strength=0.05, broken_kind="free")
        return {"a": a, "b": b}, (contact,)

    full = MultiBodyEngine(*bodies())
    rfull = full.run()
    assert float(rfull.bonded[0]) == 0.0, "interface must actually break"

    part = MultiBodyEngine(*bodies())
    part.nsteps = cut
    part.run()
    ckdir = str(tmp_path / "ckm")
    save_checkpoint(ckdir, cut, part.state_dict())

    resumed = MultiBodyEngine(*bodies())
    resumed.load_state(restore_checkpoint(ckdir, resumed.state_dict()))
    assert resumed.start_step == cut
    rres = resumed.run()
    assert float(rres.bonded[0]) == 0.0
    for name in ("a", "b"):
        np.testing.assert_allclose(rres.bodies[name], rfull.bodies[name],
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from gcm_tpu.utils.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
    )

    state = {"u": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, 7, state)
    assert latest_step(ckdir) == 7
    got = restore_checkpoint(ckdir, state)
    np.testing.assert_array_equal(np.asarray(got["u"]), np.asarray(state["u"]))
    assert int(got["step"]) == 7


def test_pvd_series_written_and_indexed(tmp_path):
    """Cadenced snapshot runs emit a ParaView collection indexing the
    series by physical time."""
    import xml.etree.ElementTree as ET

    import jax.numpy as jnp

    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario
    from gcm_tpu.task import SnapshotSpec

    import dataclasses

    task = get_scenario("acoustic1d", n=64, nsteps=20)
    task = dataclasses.replace(task, snapshots=SnapshotSpec(every=5))
    eng = Engine(task, dtype=jnp.float32)
    eng.run_with_outputs(str(tmp_path))
    pvd = tmp_path / "snapshots" / "acoustic1d.pvd"
    assert pvd.exists()
    root = ET.parse(pvd).getroot()
    entries = root.findall(".//DataSet")
    # every=5 rounds UP to the symmetrization period: snapshots at steps
    # 6, 12, 18 — the documented cadence convention shared with the
    # multi-body engines ("every 6 steps, never every 4"); Engine used
    # to round DOWN to 4 (code-review r5)
    assert len(entries) == 3
    times = [float(e.attrib["timestep"]) for e in entries]
    assert times == sorted(times) and times[0] > 0
    assert len(set(times)) == len(times)
    for e in entries:
        assert (tmp_path / "snapshots" / e.attrib["file"]).exists()


def test_checkpoints_without_snapshots(tmp_path):
    """--checkpoint-every must work with snapshots DISABLED: checkpoints
    used to be written only from inside the snapshot callback, so
    SnapshotSpec(every=0) silently disabled checkpointing and --resume
    restarted from step 0 (code-review r5)."""
    from gcm_tpu.engine import Engine
    from gcm_tpu.utils.checkpoint import latest_step

    task = _damage_task(8)
    assert task.snapshots.every == 0
    eng = Engine(task)
    eng.run_with_outputs(str(tmp_path), checkpoint_every=4)
    ckdir = str(tmp_path / "checkpoints")
    assert latest_step(ckdir) == 8

    # and the independent cadences still both fire when snapshots are on
    import dataclasses as _dc

    from gcm_tpu.task import SnapshotSpec

    task2 = _dc.replace(_damage_task(8), name="snapck",
                        snapshots=SnapshotSpec(every=4))
    out2 = tmp_path / "both"
    Engine(task2).run_with_outputs(str(out2), checkpoint_every=2)
    assert latest_step(str(out2 / "checkpoints")) == 8
    snaps = list((out2 / task2.snapshots.directory).glob("*.vti"))
    assert len(snaps) == 2   # steps 4 and 8


def test_resume_preserves_detector_traces(tmp_path):
    """A resumed run's seismogram must cover the FULL record: traces are
    checkpointed (npz sidecar) and the restored chunks are prepended, so
    resume == uninterrupted for receiver data too (code-review r5: the
    resumed run silently overwrote the output with only post-resume
    steps)."""
    import dataclasses as _dc

    from gcm_tpu.engine import Engine
    from gcm_tpu.task import DetectorSpec
    from gcm_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    def build(nsteps=10):
        t = _damage_task(nsteps)
        return _dc.replace(
            t, detectors=DetectorSpec(points=((12.0, 12.0), (20.0, 8.0))))

    full = Engine(build())
    rfull = full.run()
    assert rfull.traces is not None and rfull.traces.shape[0] == 10

    cut = 6
    part = Engine(build())
    part.nsteps = cut
    rpart = part.run()
    assert rpart.traces.shape[0] == cut
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, cut, part.state_dict())

    resumed = Engine(build())
    resumed.load_state(restore_checkpoint(ckdir, resumed.state_dict()))
    res = resumed.run()
    assert res.traces.shape[0] == 10, "resumed seismogram must be complete"
    np.testing.assert_allclose(res.traces, rfull.traces,
                               rtol=1e-6, atol=1e-8)


def test_scalar_wavelet_source():
    """A WaveletSource whose fn returns a scalar (constant drive) must
    broadcast on the structured engines like it does on the simplex ones
    (code-review r5: IndexError in Engine, shape error in
    MultiBodyEngine)."""
    import dataclasses as _dc

    from gcm_tpu.engine import Engine
    from gcm_tpu.task import WaveletSource

    t = _damage_task(4)
    src = WaveletSource(position=(12.0, 12.0), components=("sxx", "syy"),
                        fn=lambda ts: 0.5)
    t = _dc.replace(t, sources=(src,))
    res = Engine(t).run()
    assert np.isfinite(res.u).all()
    assert np.abs(res.u).max() > 0.0


def test_multibody_resume_preserves_traces(tmp_path):
    """The multi-body engines checkpoint detector traces too (dict-valued
    npz sidecar): a resumed contact run's seismograms must cover the full
    record (code-review r5 — the fix initially covered only the
    single-body engines while the CLI exposes --resume for contact
    scenarios)."""
    import dataclasses as _dc

    from gcm_tpu.engine_multi import MultiBodyEngine
    from gcm_tpu.scenarios import elastic3d_contact
    from gcm_tpu.task import DetectorSpec
    from gcm_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    def build(nsteps=10):
        bodies, contacts = elastic3d_contact(n=12, nsteps=nsteps)
        bodies = {
            k: _dc.replace(t, detectors=DetectorSpec(
                points=((500.0, 500.0, 100.0),)))
            for k, t in bodies.items()}
        return MultiBodyEngine(bodies, contacts)

    full = build()
    rfull = full.run()
    assert rfull.traces and all(v.shape[0] == 10
                                for v in rfull.traces.values())

    cut = 6
    part = build()
    part.nsteps = cut
    part.run()
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, cut, part.state_dict())

    resumed = build()
    resumed.load_state(restore_checkpoint(ckdir, resumed.state_dict()))
    assert resumed.start_step == cut
    res = resumed.run()
    for k, v in res.traces.items():
        assert v.shape[0] == 10, (k, v.shape)
        np.testing.assert_allclose(v, rfull.traces[k], rtol=1e-6, atol=1e-8)
