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
