"""Contact & fracture tests (SURVEY.md §0.4, BASELINE config 4).

Key invariant: a *bonded* contact between two identical bodies with
collocated interface nodes reproduces the monolithic single-domain solution
exactly at order 1 (the contact solve degenerates to the interior
characteristic update).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.contact import ContactSpec
from gcm_tpu.solver.gcm import step
from gcm_tpu.solver.multi import step_multi
from gcm_tpu.task import BorderSpec

MAT = IsotropicMaterial.from_speeds(rho=1000.0, cp=2000.0, cs=1100.0)


def _mat(shape):
    return MaterialFields.uniform(MAT, shape, xp=jnp, dtype=jnp.float64)


def _split_state(u, k, axis):
    """Split monolithic state at node k (collocated) along spatial axis."""
    sl_a = [slice(None)] * u.ndim
    sl_b = [slice(None)] * u.ndim
    sl_a[axis + 1] = slice(0, k + 1)
    sl_b[axis + 1] = slice(k, None)
    return u[tuple(sl_a)], u[tuple(sl_b)]


@pytest.mark.parametrize("model_name,shape,axis", [
    ("elastic1d", (41,), 0),
    ("elastic2d", (21, 12), 0),
    ("elastic2d", (12, 21), 1),
    ("elastic3d", (13, 8, 7), 0),
])
def test_bonded_contact_equals_monolithic(model_name, shape, axis, rng):
    model = get_model(model_name)
    dim = model.dim
    h = tuple(1.0 for _ in range(dim))
    dt = 0.6 / MAT.cp
    u0 = rng.standard_normal((model.ncomp,) + shape)
    # smooth
    for a in range(1, u0.ndim):
        u0 = 0.25 * np.roll(u0, 1, a) + 0.5 * u0 + 0.25 * np.roll(u0, -1, a)

    borders = {(a, s): BorderSpec("absorbing") for a in range(dim) for s in (0, 1)}
    mono = jnp.asarray(u0)
    mat_m = _mat(shape)
    k = shape[axis] // 2

    ua, ub = _split_state(jnp.asarray(u0), k, axis)
    mats = {"a": _mat(ua.shape[1:]), "b": _mat(ub.shape[1:])}
    body_borders = {
        "a": {f: b for f, b in borders.items() if f != (axis, 1)},
        "b": {f: b for f, b in borders.items() if f != (axis, 0)},
    }
    contact = ContactSpec("a", "b", axis=axis, kind="bonded")
    us = {"a": ua, "b": ub}
    hs = {"a": h, "b": h}

    for n in range(4):
        axes = tuple(range(dim))
        if n % 2:
            axes = axes[::-1]
        mono = step(model, mono, mat_m, dt, h, 1, borders, axes)
        us, _ = step_multi(model, us, mats, dt, hs, 1, body_borders,
                           (contact,), {}, axes)

    mono = np.asarray(mono)
    ma, mb = _split_state(mono, k, axis)
    np.testing.assert_allclose(np.asarray(us["a"]), ma, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(us["b"]), mb, rtol=1e-12, atol=1e-12)


def _pulse_1d(n, k, center, width, sign_stress):
    """Left-to-right traveling P pulse in body coordinates."""
    model = get_model("elastic1d")
    x = np.arange(n, dtype=float)
    prof = np.exp(-((x - center) ** 2) / (2 * width**2))
    z = MAT.rho * MAT.cp
    u = np.zeros((2, n))
    # right-going: w_R = s − z v carries it → s = sign*prof, v = −sign*prof/z
    u[1] = sign_stress * prof
    u[0] = -sign_stress * prof / z
    return u


@pytest.mark.parametrize("sign_stress,should_break", [(+1.0, True), (-1.0, False)])
def test_fracture_tension_breaks_compression_does_not(sign_stress, should_break):
    """A tensile pulse exceeding the strength breaks the interface (blocks
    transmission); an equal compressive pulse passes through."""
    model = get_model("elastic1d")
    n = 60
    u0 = _pulse_1d(n, None, 40.0, 5.0, sign_stress)
    # body a: nodes 0..59 with pulse; body b: 60 fresh nodes, quiet
    us = {"a": jnp.asarray(u0), "b": jnp.asarray(np.zeros((2, n)))}
    mats = {"a": _mat((n,)), "b": _mat((n,))}
    hs = {"a": (1.0,), "b": (1.0,)}
    borders = {
        "a": {(0, 0): BorderSpec("absorbing")},
        "b": {(0, 1): BorderSpec("absorbing")},
    }
    # strength well below the pulse peak so the bond snaps on the leading
    # edge — only ~strength-sized stress leaks through before the break
    contact = ContactSpec("a", "b", axis=0, kind="bonded",
                          tensile_strength=0.05, broken_kind="free")
    bonded = {0: jnp.ones(())}  # 1D interface: scalar mask
    dt = 0.9 / MAT.cp
    nsteps = 60
    for k in range(nsteps):
        us, bonded = step_multi(model, us, mats, dt, hs, 1, borders,
                                (contact,), bonded)
    trans = float(jnp.abs(us["b"][1]).max())
    if should_break:
        assert float(bonded[0]) == 0.0, "interface should have broken"
        assert trans < 0.15, f"broken contact must block transmission, got {trans}"
    else:
        assert float(bonded[0]) == 1.0, "compression must not break the bond"
        assert trans > 0.9, f"bonded contact must transmit, got {trans}"


def test_slip_contact_blocks_shear_transmits_normal():
    """Slip contact: S pulse reflects at the interface, P pulse transmits."""
    model = get_model("elastic2d")
    n, m = 40, 8
    z_p = MAT.rho * MAT.cp
    z_s = MAT.rho * MAT.cs
    x = np.arange(n, dtype=float)
    prof = np.exp(-((x - 28.0) ** 2) / (2 * 4.0**2))

    def run(wave):
        u0 = np.zeros((model.ncomp, n, m))
        if wave == "p":
            u0[model.comp("sxx")] = prof[:, None]
            u0[model.comp("vx")] = -prof[:, None] / z_p
        else:
            u0[model.comp("sxy")] = prof[:, None]
            u0[model.comp("vy")] = -prof[:, None] / z_s
        us = {"a": jnp.asarray(u0), "b": jnp.asarray(np.zeros_like(u0))}
        mats = {"a": _mat((n, m)), "b": _mat((n, m))}
        hs = {"a": (1.0, 1.0), "b": (1.0, 1.0)}
        borders = {
            "a": {(0, 0): BorderSpec("absorbing")},
            "b": {(0, 1): BorderSpec("absorbing")},
        }
        contact = ContactSpec("a", "b", axis=0, kind="slip")
        us_out = us
        dt = 0.9 / MAT.cp
        for k in range(40):
            us_out, _ = step_multi(model, us_out, mats, dt, hs, 1, borders,
                                   (contact,), {}, axes=(0,))
        comp = model.comp("sxx") if wave == "p" else model.comp("sxy")
        return float(jnp.abs(us_out["b"][comp]).max())

    assert run("p") > 0.9       # P transmits through slip contact
    assert run("s") < 1e-9      # shear does not cross a frictionless interface


def _ortho_fields(shape, rho=1200.0, scale=1.0):
    """Uniform genuinely-orthotropic fields (distinct stiffnesses per axis)."""
    from gcm_tpu.materials import OrthotropicMaterialFields

    ones = jnp.ones(shape, dtype=jnp.float64)
    c = dict(c11=9.0e9, c12=2.0e9, c13=1.5e9, c22=6.5e9, c23=1.2e9,
             c33=5.0e9, c44=1.8e9, c55=2.2e9, c66=2.6e9)
    return OrthotropicMaterialFields.from_constants(
        rho * ones, {k: v * scale * ones for k, v in c.items()}, xp=jnp,
        dtype=jnp.float64)


@pytest.mark.parametrize("axis", [0, 1])
def test_bonded_contact_orthotropic_equals_monolithic(axis, rng):
    """Contact is anisotropy-agnostic: the two-impedance interface solve over
    AxisView impedances reproduces the monolithic orthotropic solution."""
    model = get_model("elastic2d")
    shape = (17, 14)
    h = (1.0, 1.0)
    mat_m = _ortho_fields(shape)
    dt = 0.5 * min(h) / mat_m.max_cp()
    u0 = rng.standard_normal((model.ncomp,) + shape)
    for a in range(1, u0.ndim):
        u0 = 0.25 * np.roll(u0, 1, a) + 0.5 * u0 + 0.25 * np.roll(u0, -1, a)

    borders = {(a, s): BorderSpec("absorbing") for a in range(2) for s in (0, 1)}
    mono = jnp.asarray(u0)
    k = shape[axis] // 2
    ua, ub = _split_state(jnp.asarray(u0), k, axis)
    mats = {"a": _ortho_fields(ua.shape[1:]), "b": _ortho_fields(ub.shape[1:])}
    body_borders = {
        "a": {f: b for f, b in borders.items() if f != (axis, 1)},
        "b": {f: b for f, b in borders.items() if f != (axis, 0)},
    }
    contact = ContactSpec("a", "b", axis=axis, kind="bonded")
    us = {"a": ua, "b": ub}
    hs = {"a": h, "b": h}

    for n in range(4):
        axes = (0, 1) if n % 2 == 0 else (1, 0)
        mono = step(model, mono, mat_m, dt, h, 1, borders, axes)
        us, _ = step_multi(model, us, mats, dt, hs, 1, body_borders,
                           (contact,), {}, axes)

    mono = np.asarray(mono)
    ma, mb = _split_state(mono, k, axis)
    np.testing.assert_allclose(np.asarray(us["a"]), ma, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(us["b"]), mb, rtol=1e-12, atol=1e-12)


def test_bonded_contact_orthotropic_dissimilar_conserves_interface():
    """Dissimilar orthotropic bodies: transmitted+reflected energy behaves
    physically (transmission happens, interface tractions stay continuous)."""
    from gcm_tpu.solver.boundary import face_index

    model = get_model("elastic2d")
    n, m = 40, 6
    mat_a = _ortho_fields((n, m))
    mat_b = _ortho_fields((n, m), rho=2600.0, scale=3.0)
    x = np.arange(n, dtype=float)
    prof = np.exp(-((x - 30.0) ** 2) / (2 * 3.0**2))
    zpa = float(np.asarray(mat_a.axis_view(0, model.stage(0)).pair_z[0])[0, 0])
    u0 = np.zeros((model.ncomp, n, m))
    u0[model.comp("sxx")] = prof[:, None]
    u0[model.comp("vx")] = -prof[:, None] / zpa
    us = {"a": jnp.asarray(u0), "b": jnp.zeros_like(jnp.asarray(u0))}
    mats = {"a": mat_a, "b": mat_b}
    hs = {"a": (1.0, 1.0), "b": (1.0, 1.0)}
    borders = {
        "a": {(0, 0): BorderSpec("absorbing")},
        "b": {(0, 1): BorderSpec("absorbing")},
    }
    contact = ContactSpec("a", "b", axis=0, kind="bonded")
    dt = 0.9 / mat_b.max_cp()
    for k in range(60):
        us, _ = step_multi(model, us, mats, dt, hs, 1, borders,
                           (contact,), {}, axes=(0,))
    # wave crossed into body b
    assert float(jnp.abs(us["b"][model.comp("sxx")]).max()) > 0.5
    # interface continuity of traction and normal velocity (adhesion)
    sa = us["a"][model.comp("sxx")][face_index(0, 1)]
    sb = us["b"][model.comp("sxx")][face_index(0, 0)]
    va = us["a"][model.comp("vx")][face_index(0, 1)]
    vb = us["b"][model.comp("vx")][face_index(0, 0)]
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-9)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-12)
