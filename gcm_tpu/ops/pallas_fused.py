"""Fused full-step Pallas TPU kernel: every splitting sweep in ONE HBM pass.

The per-sweep kernels (gcm_tpu.ops.pallas_stage) already fuse transform →
stencil → BC → back-transform, but a 3D step still makes three passes over
the state (read 9 + write 9 fields per sweep).  This kernel exploits the
key locality fact of dimensional splitting: *every* sweep of a step depends
only on the pre-step state inside an r-cell halo per tiled axis, where
``r = stencil_radius(order)``.  So one kernel can

- DMA a ``(ncomp, bx+2r, by+2r, nz)`` window of the state (and material
  stack) from HBM into VMEM — 3x3 clamped segment copies, double-buffered
  across grid steps so the next tile's loads overlap this tile's compute;
- run the x, y and z characteristic sweeps entirely in VMEM (the x sweep
  consumes the x-halo, the y sweep the y-halo, the z sweep keeps the whole
  lane axis in-block), applying edge clamping and the characteristic border
  conditions (gcm_tpu.solver.boundary algebra) at true domain faces;
- write the ``(ncomp, bx, by, nz)`` tile once through the normal pipelined
  output.

HBM traffic per step drops from ~6 state passes (3 sweeps x read+write) to
~(1+halo)x read + 1x write, the dominant cost on a bandwidth-bound stencil
code (SURVEY.md §6's grid-points/s metric).

Halo correctness at tile corners: the y sweep needs x-swept values at
``y ± r``, which the kernel recomputes from the loaded window — including
its corner regions — so tiles never exchange intermediate data.  At domain
faces the out-of-range window segments are clamped DMAs (in-bounds but
wrong rows) patched in-kernel to edge replication of BOTH the state and the
material windows; replicating materials too makes the recomputed halo sweep
of a patched row bit-identical to the real edge row, reproducing the jnp
path's ``edge_pad`` semantics exactly (tests/test_pallas_fused.py).

Scope: 3D (``fused_step``/``fused_step_slab``) and 2D (``fused_step_2d``)
grids, f32, isotropic AND orthotropic media (three material-stack layouts
— derived/compact isotropic and the per-stiffness orthotropic stack —
inferred from the stack height), orders 1..4, axes order (0,1,2) or its
reverse (the engine's symmetrized splitting).  Reference counterpart: the
per-node stage loop of ``GridCharacteristicMethod`` (SURVEY.md §3.2) —
reimagined as a single-pass, windowed, in-VMEM pipeline rather than a
translation.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import Model
from gcm_tpu.ops.interp import stencil_offsets, stencil_radius, stencil_weights
from gcm_tpu.task import BorderSpec
from gcm_tpu.utils.backend import default_interpret, on_tpu

Borders = Dict[Tuple[int, int], BorderSpec]

_Z_EPS = 1e-30


# --------------------------------------------------------------- material stack

def _model_waves(model: Model) -> List[str]:
    waves = []
    for st in model.stages:
        for p in st.pairs:
            if p.wave not in waves:
                waves.append(p.wave)
    return waves


def mat_layout(model: Model, compact: bool = False) -> List[str]:
    """Names of the material fields the fused kernel reads, in stack order.
    Isotropic media are axis-independent, so one stack serves all sweeps.

    Default ("derived") layout ships every field the sweeps consume:
    speeds ``c<w>``, impedances ``z<w>``, precomputed half-reciprocal
    impedances ``r<w>`` (= 0.5/z, 0 where z == 0 — a multiply in the hot
    loop instead of a per-pair VPU divide), and ``kappa``.

    The ``compact`` layout ships only {c<w>..., rho, kappa} and derives
    z/r in-kernel per tile (two multiplies + one reciprocal per wave over
    the tile window): the kernel is DMA-bound (round-2 roofline study in
    BASELINE.md), so trading a little VPU work for 3 fewer streamed fields
    is a net win."""
    waves = _model_waves(model)
    if compact:
        fields = [f"c{w}" for w in waves] + ["rho"]
    else:
        fields = ([f"c{w}" for w in waves] + [f"z{w}" for w in waves]
                  + [f"r{w}" for w in waves])
    if any(st.zeros for st in model.stages):
        fields.append("kappa")
    return fields


def stack_mats(model: Model, mat: MaterialFields,
               compact: bool = False) -> jnp.ndarray:
    """Stack the needed per-node material fields into one (nm, *spatial)
    array.  Call once at setup — not inside the stepped loop."""
    zp = jnp.asarray(mat.zp)
    zs = jnp.asarray(mat.zs)

    def half_recip(z):
        return jnp.where(z > 0, 0.5 / jnp.maximum(z, _Z_EPS), 0.0)

    name_map = {"cp": mat.cp, "cs": mat.cs, "zp": zp, "zs": zs,
                "rp": half_recip(zp), "rs": half_recip(zs),
                "rho": mat.rho, "kappa": mat.kappa}
    return jnp.stack([jnp.asarray(name_map[f])
                      for f in mat_layout(model, compact)])


def _stiff_label(model_dim: int, a: int, t: int) -> str:
    """Voigt label of the stiffness that drives the (a, t) pair's speed."""
    if a == t:
        return f"{a + 1}{a + 1}"
    if model_dim == 2:
        return "66"
    return {(1, 2): "44", (0, 2): "55", (0, 1): "66"}[(min(a, t), max(a, t))]


def _zero_axis(zc) -> int:
    """Spatial axis of a zero-invariant's diagonal stress component."""
    from gcm_tpu.materials import _DIAG_AXIS_OF_COMP

    return _DIAG_AXIS_OF_COMP[zc.comp]


def ortho_mat_layout(model: Model) -> List[str]:
    """Field names of the orthotropic stack: per-stiffness speeds
    ``v<lbl> = sqrt(c_lbl/rho)``, ``rho``, and per-(sweep, zero) coupling
    ratios ``k<a><b> = c_ab/c_aa``.  Impedances z<lbl> = rho*v<lbl> and
    half-reciprocals r<lbl> are derived in-kernel (the kernel is DMA-bound,
    so 13 streamed fields instead of 21+ is the winning trade)."""
    speeds: List[str] = []
    kaps: List[str] = []
    for st in model.stages:
        for p in st.pairs:
            name = f"v{_stiff_label(model.dim, st.axis, p.traction_axis)}"
            if name not in speeds:
                speeds.append(name)
        for zc in st.zeros:
            name = f"k{st.axis}{_zero_axis(zc)}"
            if name not in kaps:
                kaps.append(name)
    return speeds + ["rho"] + kaps


def stack_mats_ortho(model: Model, mat) -> jnp.ndarray:
    """Stack an OrthotropicMaterialFields into the fused-kernel layout."""
    rho = jnp.asarray(mat.rho)
    stiff = {"11": mat.c11, "22": mat.c22, "33": mat.c33,
             "44": mat.c44, "55": mat.c55, "66": mat.c66}
    diag = {0: mat.c11, 1: mat.c22, 2: mat.c33}
    arrs = []
    for name in ortho_mat_layout(model):
        if name == "rho":
            arrs.append(rho)
        elif name.startswith("v"):
            arrs.append(jnp.sqrt(jnp.asarray(stiff[name[1:]]) / rho))
        else:  # k<a><b>
            a, b = int(name[1]), int(name[2])
            arrs.append(jnp.asarray(mat._offdiag(a, b))
                        / jnp.asarray(diag[a]))
    return jnp.stack([jnp.broadcast_to(x, rho.shape) for x in arrs])


class OrthoKeys:
    """Material-field naming of the orthotropic stack: per-stiffness speed
    triples and per-(sweep, zero-axis) kappas."""

    dim = 3

    @classmethod
    def pair(cls, axis: int, k: int, p) -> Tuple[str, str, str]:
        lbl = _stiff_label(cls.dim, axis, p.traction_axis)
        return f"v{lbl}", f"z{lbl}", f"r{lbl}"

    @staticmethod
    def zero(axis: int, j: int, zc) -> str:
        return f"k{axis}{_zero_axis(zc)}"


class OrthoKeys2D(OrthoKeys):
    dim = 2


def infer_layout(model: Model, nm: int) -> str:
    """Which material layout a stack of height ``nm`` carries (the three
    layouts have distinct heights for every supported model)."""
    if nm == len(mat_layout(model)):
        return "derived"
    if nm == len(mat_layout(model, compact=True)):
        return "compact"
    if nm == len(ortho_mat_layout(model)):
        return "ortho"
    raise ValueError(f"no material layout of {model.name} has {nm} fields")


def layout_names(model: Model, mode: str) -> List[str]:
    if mode == "ortho":
        return ortho_mat_layout(model)
    return mat_layout(model, compact=(mode == "compact"))


def layout_keys(model: Model, mode: str):
    if mode == "ortho":
        return OrthoKeys2D if model.dim == 2 else OrthoKeys
    return IsoKeys


def derive_window_mats(model: Model, mats: Dict[str, jnp.ndarray],
                       mode: str) -> Dict[str, jnp.ndarray]:
    """Expand a compact/ortho in-VMEM material window to the full per-sweep
    dict by deriving impedances z = rho*c and half-reciprocals r = 0.5/z.

    bf16 windows (the half-traffic material stack, VERDICT r2 item 8) are
    cast to f32 here, right after the DMA — all sweep arithmetic stays f32;
    only the HBM-resident stack and its DMA stream are half width."""
    mats = {k: (v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v)
            for k, v in mats.items()}
    if mode == "derived":
        return mats
    out = dict(mats)
    rho = mats["rho"]

    def add(ckey, zkey, rkey):
        z = rho * mats[ckey]
        out[zkey] = z
        out[rkey] = jnp.where(z > 0, 0.5 / jnp.maximum(z, _Z_EPS), 0.0)

    if mode == "compact":
        for w in _model_waves(model):
            add(f"c{w}", f"z{w}", f"r{w}")
    else:  # ortho
        for name in mats:
            if name.startswith("v"):
                add(name, f"z{name[1:]}", f"r{name[1:]}")
    return out


# --------------------------------------------------------------- correctors

def fold_corrector_specs(correctors, dt: float):
    """Static in-kernel descriptors for the ODE correctors, or None if any
    corrector cannot be folded (non-scalar Maxwell tau, unknown types).

    Folding applies the split-step corrector to the output tile BEFORE the
    store (VERDICT r3 item 8): a viscoelastic/damage step then stays a
    single HBM pass instead of paying an extra full read+write of the
    state for an elementwise update.  Returns (specs, naux): each damage
    corrector consumes/produces one aux field slot, in corrector order.
    """
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector

    specs = []
    naux = 0
    for c in correctors:
        if isinstance(c, MaxwellCorrector) and jnp.ndim(c.tau) == 0:
            import math

            specs.append(("maxwell", math.exp(-dt / float(c.tau))))
        elif isinstance(c, DamageCorrector):
            specs.append(("damage", float(c.threshold), float(c.rate)))
            naux += 1
        else:
            return None, 0
    return tuple(specs), naux


def _corrector_epilogue(model: Model, specs, comps, aux_in, dt: float):
    """Apply folded correctors to in-VMEM output-tile comps; returns the
    updated comps and the new aux fields (solver.correctors semantics)."""
    from gcm_tpu.solver.correctors import (
        _diag_stress_indices, _shear_stress_indices,
    )

    diag = _diag_stress_indices(model)
    shear = _shear_stress_indices(model)
    aux_out = []
    qi = 0
    for spec in specs:
        if spec[0] == "maxwell":
            decay = spec[1]
            if diag:
                mean = sum(comps[i] for i in diag) / len(diag)
                for i in diag:
                    comps[i] = mean + (comps[i] - mean) * decay
                for i in shear:
                    comps[i] = comps[i] * decay
        else:  # damage
            thr, rate = spec[1], spec[2]
            d = aux_in[qi]
            qi += 1
            smax = comps[diag[0]]
            for i in diag[1:]:
                smax = jnp.maximum(smax, comps[i])
            over = jnp.maximum(smax - thr, 0.0) / thr
            d_new = jnp.clip(d + rate * over * dt, 0.0, 1.0)
            # incremental degradation — must mirror DamageCorrector
            # exactly (code-review r5)
            factor = jnp.minimum(
                (1.0 - d_new) / jnp.maximum(1.0 - d, 1e-12), 1.0)
            for i in diag + shear:
                comps[i] = comps[i] * factor
            aux_out.append(d_new)
    return comps, aux_out


# ------------------------------------------------------------------ window math

def _row_mask(shape, d: int, lo: Optional[int] = None, hi: Optional[int] = None):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, d)
    m = None
    if lo is not None:
        m = rows < lo
    if hi is not None:
        mh = rows >= hi
        m = mh if m is None else (m | mh)
    return m


def _slab(x, d: int, s: int, n: int):
    idx = [slice(None)] * x.ndim
    idx[d] = slice(s, s + n)
    return x[tuple(idx)]


def _patch_dim(w, d: int, r: int, is_lo, is_hi):
    """Edge-replicate the r halo rows along dim d at true domain faces."""
    n = w.shape[d]
    lo = _row_mask(w.shape, d, lo=r) & is_lo
    hi = _row_mask(w.shape, d, hi=n - r) & is_hi
    w = jnp.where(lo, _slab(w, d, r, 1), w)
    w = jnp.where(hi, _slab(w, d, n - r - 1, 1), w)
    return w


def _bc_incoming(out, kind: str, value: float, sign, z, side: int):
    """Incoming invariant from the outgoing one (solver.boundary algebra)."""
    if kind == "absorbing":
        return jnp.zeros_like(out)
    if kind == "free":
        return -out
    if kind == "fixed_force":
        return 2.0 * value - out
    if kind == "fixed_velocity":
        s = -1.0 if side == 0 else 1.0
        return out + s * 2.0 * sign * z * value
    raise ValueError(kind)  # pragma: no cover


class IsoKeys:
    """Material-field naming of the isotropic layouts: one (c, z, r) triple
    per wave family and a single kappa for every zero invariant."""

    @staticmethod
    def pair(axis: int, k: int, p) -> Tuple[str, str, str]:
        return f"c{p.wave}", f"z{p.wave}", f"r{p.wave}"

    @staticmethod
    def zero(axis: int, j: int, zc) -> str:
        return "kappa"


def _sweep_window(
    model: Model,
    comps: List[jnp.ndarray],
    mats: Dict[str, jnp.ndarray],
    axis: int,
    order: int,
    dt_over_h: float,
    borders: Optional[Borders],
    faces: Tuple,
    trim: bool,
    keys=IsoKeys,
    bc_off: int = 0,
) -> Tuple[List[jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One characteristic sweep over in-VMEM window arrays.

    ``comps``: per-component (X, Y, Z) arrays; ``mats``: field-name → array
    of the same extents.  ``trim=True`` consumes an r-cell halo along
    ``axis`` (output extent shrinks by 2r); ``trim=False`` keeps the full
    extent and edge-pads in-VMEM (the lane-axis sweep).  ``faces`` are
    traced (is_low_face, is_high_face) booleans of this tile.  ``keys``
    maps (axis, pair/zero) to material field names — IsoKeys for isotropic
    stacks, OrthoKeys for the axis-dependent orthotropic stack.

    ``bc_off``: index of the TRUE domain border node measured from the
    output's window edge.  0 for a single-step kernel; a temporally
    blocked kernel's intermediate steps keep an outer halo of virtual
    (edge-replicated) rows, so their border node sits ``(K-1-s)*r`` rows
    in.  The border-condition mask covers rows 0..bc_off (resp. the top
    ``bc_off+1`` rows): the row AT bc_off is the physical BC application;
    the virtual rows outside it hold don't-care values that the caller
    re-patches to edge replication before the next step.
    """
    st = model.stage(axis)
    sign = model.sign
    r = stencil_radius(order)
    d = axis
    n = comps[0].shape[d]

    if trim:
        n_out = n - 2 * r
        pad = lambda f: f
        region = lambda f: _slab(f, d, r, n_out)
    else:
        n_out = n

        def pad(f):
            lo = _slab(f, d, 0, 1)
            hi = _slab(f, d, n - 1, 1)
            return jnp.concatenate([lo] * r + [f] + [hi] * r, axis=d)

        region = lambda f: f

    # per-speed-field Courant weights at the target nodes.
    # (A symmetric/antisymmetric regrouping that halves the multiplies was
    # implemented and measured 25% SLOWER on-chip — Mosaic schedules the
    # plain four-interp multiply-accumulate chains better than the
    # regrouped form's extra tap-sum temporaries; BASELINE.md round-4.)
    wts_by_ckey = {}
    for k, p in enumerate(st.pairs):
        ckey = keys.pair(axis, k, p)[0]
        if ckey not in wts_by_ckey:
            nu = region(mats[ckey]) * dt_over_h
            wts_by_ckey[ckey] = stencil_weights(order, nu)
    offs_p = stencil_offsets(order, +1)
    offs_m = stencil_offsets(order, -1)

    def interp(fp, offs, wts):
        out = None
        for o, w_ in zip(offs, wts):
            t = w_ * _slab(fp, d, r + o, n_out)
            out = t if out is None else out + t
        return out

    new: Dict[int, jnp.ndarray] = {}
    for k, p in enumerate(st.pairs):
        ckey, zkey, rkey = keys.pair(axis, k, p)
        A_pad = pad(comps[p.sigma])
        B_pad = pad(comps[p.vel])
        wts = wts_by_ckey[ckey]
        z = region(mats[zkey])
        szb = sign * z
        w_l = interp(A_pad, offs_p, wts) + szb * interp(B_pad, offs_p, wts)
        w_r = interp(A_pad, offs_m, wts) - szb * interp(B_pad, offs_m, wts)

        if borders is not None:
            for side in (0, 1):
                bc = borders.get((axis, side))
                if bc is None:
                    continue
                # st.axis = PHYSICAL axis (== axis except for
                # permuted-layout models, models/spec.permuted_model)
                val = bc.pair_value(p.traction_axis, st.axis)
                mask = _row_mask(w_l.shape, d,
                                 lo=bc_off + 1 if side == 0 else None,
                                 hi=n_out - 1 - bc_off if side == 1 else None)
                mask = mask & faces[side]
                out_w = w_l if side == 0 else w_r
                inc = _bc_incoming(out_w, bc.kind, val, sign, z, side)
                if side == 0:
                    w_r = jnp.where(mask, inc, w_r)
                else:
                    w_l = jnp.where(mask, inc, w_l)

        A_new = 0.5 * (w_l + w_r)
        B_old = region(comps[p.vel])
        rz = region(mats[rkey])  # 0.5/z, 0 where z == 0
        B_prop = sign * (w_l - w_r) * rz
        new[p.sigma] = A_new
        new[p.vel] = jnp.where(z > 0, B_prop, B_old)

    for j, zc in enumerate(st.zeros):
        kap = region(mats[keys.zero(axis, j, zc)])
        d_src = new[zc.src] - region(comps[zc.src])
        new[zc.comp] = region(comps[zc.comp]) + kap * d_src

    out_comps = [new.get(i, region(comps[i])) for i in range(model.ncomp)]
    out_mats = {k: region(v) for k, v in mats.items()}
    return out_comps, out_mats


# ---------------------------------------------------------------------- kernel

def _make_fused_kernel(model: Model, order: int, dtohs: Sequence[float],
                       borders: Optional[Borders],
                       axes_seq: Tuple[Tuple[int, ...], ...],
                       bx: int, by: int, nx: int, ny: int, nz: int,
                       nm: int, ntx: int, nty: int,
                       correctors: Tuple = (), naux: int = 0,
                       dt_corr: float = 0.0):
    """``axes_seq``: one axes order per time step run inside the window.
    len(axes_seq) == 1 is the classic single-step kernel; K > 1 is the
    temporally blocked kernel (K steps per HBM pass, K*r halo) — each
    intermediate step's halo rows are recomputed from the window, and at
    true domain faces the shrinking halo is re-patched to edge replication
    so step s+1 sees exactly the jnp path's edge_pad + border semantics."""
    C = model.ncomp
    r = stencil_radius(order)
    K = len(axes_seq)
    halo = K * r
    X, Y = bx + 2 * halo, by + 2 * halo
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)
    # DMA decomposition: 3x3 clamped segments (x-halo/center, y-halo/center).
    # Destination offsets are static; source offsets are clamped so edge
    # tiles read in-bounds-but-wrong rows, patched to edge replication below.
    segs = [(sx, sy) for sx in range(3) for sy in range(3)
            if not (halo == 0 and (sx != 1 or sy != 1))]

    def _src_x(i, sx):
        if sx == 0:
            return jnp.clip(i * bx - halo, 0, nx - halo), halo
        if sx == 1:
            return i * bx, bx
        return jnp.clip((i + 1) * bx, 0, nx - halo), halo

    def _src_y(j, sy):
        if sy == 0:
            return jnp.clip(j * by - halo, 0, ny - halo), halo
        if sy == 1:
            return j * by, by
        return jnp.clip((j + 1) * by, 0, ny - halo), halo

    _dst_x = {0: (0, halo), 1: (halo, bx), 2: (halo + bx, halo)}
    _dst_y = {0: (0, halo), 1: (halo, by), 2: (halo + by, halo)}

    def kernel(*refs):
        # with folded correctors the call gains a pipelined aux input
        # block and a second (aux) output; scratch refs always trail
        if naux:
            u_hbm, m_hbm, aux_ref, out_ref, aux_out = refs[:5]
            uwin, mwin, sem_u, sem_m = refs[5:]
        else:
            u_hbm, m_hbm, out_ref = refs[:3]
            aux_ref = aux_out = None
            uwin, mwin, sem_u, sem_m = refs[3:]
        ix = pl.program_id(0)
        iy = pl.program_id(1)
        t = ix * nty + iy
        total = ntx * nty
        slot = t % 2
        nslot = (t + 1) % 2

        def dmas(slot_, i, j):
            ops = []
            for k, (sx, sy) in enumerate(segs):
                ox, lx = _src_x(i, sx)
                oy, ly = _src_y(j, sy)
                dx, _ = _dst_x[sx]
                dy, _ = _dst_y[sy]
                ops.append(pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(ox, lx), pl.ds(oy, ly), :],
                    uwin.at[slot_, :, pl.ds(dx, lx), pl.ds(dy, ly), :],
                    sem_u.at[slot_, k],
                ))
                ops.append(pltpu.make_async_copy(
                    m_hbm.at[:, pl.ds(ox, lx), pl.ds(oy, ly), :],
                    mwin.at[slot_, :, pl.ds(dx, lx), pl.ds(dy, ly), :],
                    sem_m.at[slot_, k],
                ))
            return ops

        @pl.when(t == 0)
        def _():
            for op in dmas(slot, ix, iy):
                op.start()

        @pl.when(t + 1 < total)
        def _():
            nt = t + 1
            for op in dmas(nslot, nt // nty, nt % nty):
                op.start()

        for op in dmas(slot, ix, iy):
            op.wait()

        lo_x, hi_x = ix == 0, ix == ntx - 1
        lo_y, hi_y = iy == 0, iy == nty - 1

        if halo > 0:
            # Edge-replicate state AND materials at true domain faces, as
            # tiny predicated in-place scratch writes (only edge tiles pay;
            # interior tiles skip).  With materials replicated too, the
            # recomputed halo sweep of a patched row is identical to the
            # real edge row — the jnp path's edge_pad semantics.  The
            # y-patch runs after the x-patch so corners replicate the
            # corner node.
            def _patch(win, nw, d_ext):
                X_, Y_ = win.shape[2], win.shape[3]

                @pl.when(lo_x)
                def _():
                    win[slot, :, pl.ds(0, halo)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(halo, 1)], (nw, halo, Y_, d_ext))

                @pl.when(hi_x)
                def _():
                    win[slot, :, pl.ds(X_ - halo, halo)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(X_ - halo - 1, 1)],
                        (nw, halo, Y_, d_ext))

                @pl.when(lo_y)
                def _():
                    win[slot, :, :, pl.ds(0, halo)] = jnp.broadcast_to(
                        win[slot, :, :, pl.ds(halo, 1)], (nw, X_, halo, d_ext))

                @pl.when(hi_y)
                def _():
                    win[slot, :, :, pl.ds(Y_ - halo, halo)] = jnp.broadcast_to(
                        win[slot, :, :, pl.ds(Y_ - halo - 1, 1)],
                        (nw, X_, halo, d_ext))

            _patch(uwin, C, nz)
            _patch(mwin, nm, nz)

        Wu = uwin[slot]
        Wm = mwin[slot]
        comps = [Wu[c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[k]: Wm[k] for k in range(nm)}, mode)

        faces_by_axis = {
            0: (lo_x, hi_x),
            1: (lo_y, hi_y),
            2: (True, True),
        }
        for s, ax in enumerate(axes_seq):
            m_out = (K - 1 - s) * r
            for a in ax:
                comps, mats = _sweep_window(
                    model, comps, mats, a, order, dtohs[a], borders,
                    faces_by_axis[a], trim=(a != 2), keys=keys,
                    bc_off=(m_out if a != 2 else 0),
                )
            if m_out > 0:
                # re-assert edge replication on the remaining halo at true
                # domain faces: the swept virtual rows are don't-cares, and
                # step s+1's stencil must see edge_pad of the step-s state
                comps = [
                    _patch_dim(_patch_dim(c, 0, m_out, lo_x, hi_x),
                               1, m_out, lo_y, hi_y)
                    for c in comps]

        if correctors:
            aux_in = ([aux_ref[q] for q in range(naux)] if naux else [])
            comps, aux_new = _corrector_epilogue(
                model, correctors, comps, aux_in, dt_corr)
            for q in range(naux):
                aux_out[q] = aux_new[q]
        for c in range(C):
            out_ref[c] = comps[c]

    return kernel, X, Y


def _require_lane_alignment(n_lane: int, interpret, name: str) -> None:
    """Mosaic requires the lane (last) dim of the in-VMEM sweep windows to
    be a multiple of 128 on hardware: the z/y-edge pads slice single lane
    rows, which only lower when the lane extent fills whole (*,128) tiles
    (measured: nz=32/64 fail remote compile, nz=128 compiles). Interpret
    mode (CPU) has no such restriction. Engines guard this statically and
    fall back to the per-sweep Pallas kernels; direct callers get a clear
    error instead of a remote-compile crash."""
    interpret = default_interpret(interpret=interpret)
    if not interpret and n_lane % 128 != 0:
        raise ValueError(
            f"{name}: the last (lane) dimension must be a multiple of 128 "
            f"on TPU hardware (got {n_lane}); use the per-sweep pallas "
            "path for other shapes")


# ----------------------------------------------------------------- slab kernel

def _make_slab_kernel(model: Model, order: int, dtohs: Sequence[float],
                      borders: Optional[Borders],
                      axes_seq: Tuple[Tuple[int, ...], ...],
                      bx: int, nx: int, ny: int, nz: int,
                      nm: int, ntx: int,
                      correctors: Tuple = (), naux: int = 0,
                      dt_corr: float = 0.0):
    """Full-y slab variant of the fused kernel: grid over x only.

    Measured motivation (round 2, v5e): the (bx, by) window kernel is DMA-
    bound at ~43% of HBM peak because every window row is a 512 B strided
    burst. Tiling only x makes each DMA segment a CONTIGUOUS
    ``(bx+2r) * ny * nz`` run per field (multi-MB bursts): 3 clamped
    x-segments replace the 3x3 window decomposition. The y sweep switches
    to the in-VMEM edge-pad form (full y extent per tile — tile edges ARE
    domain edges), like the z sweep always did.

    ``axes_seq``: one axes order per in-window time step (temporal
    blocking, K*r x-halo — see :func:`_make_fused_kernel`); only the x
    axis needs the inter-step re-patch since y/z run full-extent.
    """
    C = model.ncomp
    r = stencil_radius(order)
    K = len(axes_seq)
    halo = K * r
    X = bx + 2 * halo
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)
    segs = [0, 1, 2] if halo > 0 else [1]

    def _src_x(i, sx):
        if sx == 0:
            return jnp.clip(i * bx - halo, 0, nx - halo), halo
        if sx == 1:
            return i * bx, bx
        return jnp.clip((i + 1) * bx, 0, nx - halo), halo

    _dst_x = {0: 0, 1: halo, 2: halo + bx}

    def kernel(*refs):
        if naux:
            u_hbm, m_hbm, aux_ref, out_ref, aux_out = refs[:5]
            uwin, mwin, sem_u, sem_m = refs[5:]
        else:
            u_hbm, m_hbm, out_ref = refs[:3]
            aux_ref = aux_out = None
            uwin, mwin, sem_u, sem_m = refs[3:]
        t = pl.program_id(0)
        slot, nslot = t % 2, (t + 1) % 2

        def dmas(slot_, i_):
            ops = []
            for k, sx in enumerate(segs):
                ox, lx = _src_x(i_, sx)
                dx = _dst_x[sx]
                ops.append(pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(ox, lx), :, :],
                    uwin.at[slot_, :, pl.ds(dx, lx), :, :],
                    sem_u.at[slot_, k]))
                ops.append(pltpu.make_async_copy(
                    m_hbm.at[:, pl.ds(ox, lx), :, :],
                    mwin.at[slot_, :, pl.ds(dx, lx), :, :],
                    sem_m.at[slot_, k]))
            return ops

        @pl.when(t == 0)
        def _():
            for op in dmas(slot, t):
                op.start()

        @pl.when(t + 1 < ntx)
        def _():
            for op in dmas(nslot, t + 1):
                op.start()

        for op in dmas(slot, t):
            op.wait()

        lo_x, hi_x = t == 0, t == ntx - 1
        if halo > 0:
            # patch the clamped x-halo rows to edge replication at domain
            # faces (state AND materials — jnp edge_pad semantics)
            def _patch(win, nw):
                @pl.when(lo_x)
                def _():
                    win[slot, :, pl.ds(0, halo)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(halo, 1)], (nw, halo, ny, nz))

                @pl.when(hi_x)
                def _():
                    win[slot, :, pl.ds(X - halo, halo)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(X - halo - 1, 1)],
                        (nw, halo, ny, nz))

            _patch(uwin, C)
            _patch(mwin, nm)

        comps = [uwin[slot, c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[k]: mwin[slot, k] for k in range(nm)}, mode)
        faces_by_axis = {0: (lo_x, hi_x), 1: (True, True), 2: (True, True)}
        for s, ax in enumerate(axes_seq):
            m_out = (K - 1 - s) * r
            for a in ax:
                comps, mats = _sweep_window(
                    model, comps, mats, a, order, dtohs[a], borders,
                    faces_by_axis[a], trim=(a == 0), keys=keys,
                    bc_off=(m_out if a == 0 else 0))
            if m_out > 0:
                comps = [_patch_dim(c, 0, m_out, lo_x, hi_x)
                         for c in comps]
        if correctors:
            aux_in = ([aux_ref[q] for q in range(naux)] if naux else [])
            comps, aux_new = _corrector_epilogue(
                model, correctors, comps, aux_in, dt_corr)
            for q in range(naux):
                aux_out[q] = aux_new[q]
        for c in range(C):
            out_ref[c] = comps[c]

    return kernel, X


def fused_step_slab(
    model: Model,
    u: jnp.ndarray,
    mstack: jnp.ndarray,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    axes: Optional[Sequence[int]] = None,
    bx: int = 4,
    interpret: Optional[bool] = None,
    vmem_budget: int = 96 * 1024 * 1024,
    axes_seq: Optional[Sequence[Sequence[int]]] = None,
    correctors: Optional[Tuple] = None,
    aux: Optional[jnp.ndarray] = None,
):
    """Full 3D step via the slab-tiled fused kernel (contiguous DMA runs).

    Same contract as :func:`fused_step` (including ``axes_seq`` temporal
    blocking and the folded corrector epilogue — the bf16 viscoelastic
    route is single-pass too, VERDICT r4 weak #4); prefer this when
    ``ny*nz`` slabs fit VMEM (the usual case) — it is
    DMA-bandwidth-optimal.
    """
    if u.ndim != 4 or model.dim != 3:
        raise ValueError("fused_step_slab supports 3D grids only")
    _require_lane_alignment(u.shape[-1], interpret, "fused_step_slab")
    axes_seq = _norm_axes_seq(axes, axes_seq, 3)
    C, nx, ny, nz = u.shape
    nm = mstack.shape[0]
    r = stencil_radius(order)
    halo = len(axes_seq) * r
    esz = u.dtype.itemsize

    def vmem_need(bx_):
        X_ = bx_ + 2 * halo
        win = 2 * (C + nm) * X_ * ny * nz * esz
        out = 2 * C * bx_ * ny * nz * esz
        tmp = 8 * X_ * ny * nz * esz
        return win + out + tmp

    bx = _pick_tile(nx, bx, 1)
    while bx > 1 and vmem_need(bx) > vmem_budget:
        bx = _pick_tile(nx, bx - 1, 1)
    if vmem_need(bx) > vmem_budget:
        raise ValueError(
            f"slab kernel needs {vmem_need(bx)/1e6:.0f} MB VMEM at bx={bx} "
            f"for ny={ny}, nz={nz} — use fused_step (windowed) instead")
    if halo > 0 and bx < halo:
        # same clamped-DMA exposure as fused_step's windowed tiles: a
        # non-edge slab with bx < halo reads wrong rows unpatched
        raise ValueError(
            f"fused_step_slab: x-tile {bx} smaller than halo {halo}; "
            "use the per-sweep pallas path")
    specs = tuple(correctors) if correctors else ()
    if specs and len(axes_seq) > 1:
        raise ValueError("fused_step_slab: folded correctors require a "
                         "single step per window (len(axes_seq) == 1)")
    naux = aux.shape[0] if (specs and aux is not None) else 0
    if specs and any(s[0] == "damage" for s in specs) and aux is None:
        raise ValueError("damage correctors need the aux array")
    ntx = nx // bx
    dtohs = [float(dt / h[a]) for a in range(3)]
    kernel, X = _make_slab_kernel(
        model, order, dtohs, borders, axes_seq, bx, nx, ny, nz, nm, ntx,
        correctors=specs, naux=naux, dt_corr=float(dt))

    nsegs = 3 if halo > 0 else 1
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = pl.BlockSpec((C, bx, ny, nz), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, nx, ny, nz), u.dtype)
    operands = (u, mstack)
    if naux:
        in_specs.append(pl.BlockSpec((naux, bx, ny, nz),
                                     lambda i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((naux, bx, ny, nz),
                                  lambda i: (0, i, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((naux, nx, ny, nz), aux.dtype)]
        operands = (u, mstack, aux)
    out = pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, C, X, ny, nz), u.dtype),
            pltpu.VMEM((2, nm, X, ny, nz), mstack.dtype),
            pltpu.SemaphoreType.DMA((2, nsegs)),
            pltpu.SemaphoreType.DMA((2, nsegs)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(128 * 1024 * 1024,
                                 vmem_budget + 32 * 1024 * 1024),
        ),
        **({"interpret": True} if default_interpret(interpret=interpret)
           else {}),
    )(*operands)
    return out


# ------------------------------------------------------------------ 2D kernel

def _make_2d_kernel(model: Model, order: int, dtohs: Sequence[float],
                    borders: Optional[Borders],
                    axes_seq: Tuple[Tuple[int, ...], ...],
                    bx: int, nx: int, ny: int, nm: int, ntx: int,
                    correctors: Tuple = (), naux: int = 0,
                    dt_corr: float = 0.0):
    """2D fused full-step kernel: x tiled with halo segments, y is the
    lane axis (in-VMEM edge pad) — the 2D analogue of the slab kernel.
    Takes 2D scenarios off the per-sweep-kernel fallback (round-1 verdict
    weak #6).

    Rank-3 HBM refs are (8,128)-tiled on the LAST TWO dims, so Mosaic
    requires x-slices to be 8-row aligned: the halo segments load a full
    8-row block (H=8 >= r), and the sweeps consume a functional
    ``W[:, H-r : H+bx+r]`` slice of the window with jnp edge patching at
    domain faces (no in-place ref writes needed).
    """
    C = model.ncomp
    r = stencil_radius(order)
    K = len(axes_seq)
    halo = K * r                # total x halo consumed by the K steps
    H = 8                       # aligned halo block (sublane tiling)
    if halo > H:
        raise ValueError(
            f"2D kernel: K*r halo {halo} exceeds the aligned halo block {H}")
    X = bx + 2 * H
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)
    segs = [0, 1, 2] if halo > 0 else [1]

    bh = bx // H

    def _src_x(i, sx):
        # offsets written as (int)*H so Mosaic can PROVE 8-divisibility
        if sx == 0:
            return jnp.clip(i * bh - 1, 0, nx // H - 1) * H, H
        if sx == 1:
            return (i * bh) * H, bx
        return jnp.clip((i + 1) * bh, 0, nx // H - 1) * H, H

    _dst_x = {0: 0, 1: H, 2: H + bx}

    def kernel(*refs):
        if naux:
            u_hbm, m_hbm, aux_ref, out_ref, aux_out = refs[:5]
            uwin, mwin, sem_u, sem_m = refs[5:]
        else:
            u_hbm, m_hbm, out_ref = refs[:3]
            aux_ref = aux_out = None
            uwin, mwin, sem_u, sem_m = refs[3:]
        t = pl.program_id(0)
        slot, nslot = t % 2, (t + 1) % 2

        def dmas(slot_, i_):
            ops = []
            for k, sx in enumerate(segs):
                ox, lx = _src_x(i_, sx)
                dx = _dst_x[sx]
                ops.append(pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(ox, lx), :],
                    uwin.at[slot_, :, pl.ds(dx, lx), :],
                    sem_u.at[slot_, k]))
                ops.append(pltpu.make_async_copy(
                    m_hbm.at[:, pl.ds(ox, lx), :],
                    mwin.at[slot_, :, pl.ds(dx, lx), :],
                    sem_m.at[slot_, k]))
            return ops

        @pl.when(t == 0)
        def _():
            for op in dmas(slot, t):
                op.start()

        @pl.when(t + 1 < ntx)
        def _():
            for op in dmas(nslot, t + 1):
                op.start()

        for op in dmas(slot, t):
            op.wait()

        lo_x, hi_x = t == 0, t == ntx - 1
        Wu = uwin[slot, :, H - halo:H + bx + halo]
        Wm = mwin[slot, :, H - halo:H + bx + halo]
        if halo > 0:
            # functional edge replication of the halo rows at domain
            # faces (clamped loads put in-bounds-but-wrong rows there)
            Wu = _patch_dim(Wu, 1, halo, lo_x, hi_x)
            Wm = _patch_dim(Wm, 1, halo, lo_x, hi_x)

        comps = [Wu[c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[k]: Wm[k] for k in range(nm)}, mode)
        faces_by_axis = {0: (lo_x, hi_x), 1: (True, True)}
        for s, ax in enumerate(axes_seq):
            m_out = (K - 1 - s) * r
            for a in ax:
                comps, mats = _sweep_window(
                    model, comps, mats, a, order, dtohs[a], borders,
                    faces_by_axis[a], trim=(a == 0), keys=keys,
                    bc_off=(m_out if a == 0 else 0))
            if m_out > 0:
                comps = [_patch_dim(c, 0, m_out, lo_x, hi_x)
                         for c in comps]
        if correctors:
            aux_in = ([aux_ref[q] for q in range(naux)] if naux else [])
            comps, aux_new = _corrector_epilogue(
                model, correctors, comps, aux_in, dt_corr)
            for q in range(naux):
                aux_out[q] = aux_new[q]
        for c in range(C):
            out_ref[c] = comps[c]

    return kernel, X


def fused_step_2d(
    model: Model,
    u: jnp.ndarray,
    mstack: jnp.ndarray,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    axes: Optional[Sequence[int]] = None,
    bx: int = 128,
    interpret: Optional[bool] = None,
    vmem_budget: int = 64 * 1024 * 1024,
    axes_seq: Optional[Sequence[Sequence[int]]] = None,
    correctors: Optional[Tuple] = None,
    aux: Optional[jnp.ndarray] = None,
):
    """One full 2D time step as a single fused Pallas kernel.

    Same contract as :func:`fused_step` for ``model.dim == 2``: ``mstack``
    from ``stack_mats`` (isotropic, optionally compact) or
    ``stack_mats_ortho``; ``axes_seq`` of length K runs K steps per HBM
    pass (K*r must fit the 8-row aligned halo block).
    """
    if u.ndim != 3 or model.dim != 2:
        raise ValueError("fused_step_2d supports 2D grids only")
    _require_lane_alignment(u.shape[-1], interpret, "fused_step_2d")
    axes_seq = _norm_axes_seq(axes, axes_seq, 2)
    C, nx, ny = u.shape
    nm = mstack.shape[0]
    r = stencil_radius(order)
    esz = u.dtype.itemsize
    if nx % 8:
        # rank-3 HBM refs are (8,128)-tiled on (x, y): halo segment loads
        # must be 8-row aligned (see _make_2d_kernel)
        raise ValueError(f"fused_step_2d needs nx % 8 == 0, got {nx}")

    def vmem_need(bx_):
        X_ = bx_ + 16
        return (2 * (C + nm) * X_ * ny + 2 * C * bx_ * ny
                + 10 * X_ * ny) * esz

    bx = _pick_tile(nx, bx, 8)
    while bx > 8 and vmem_need(bx) > vmem_budget:
        bx = _pick_tile(nx, bx - 8, 8)
    if bx % 8 or vmem_need(bx) > vmem_budget:
        raise ValueError(
            f"fused_step_2d: no 8-aligned x-tile of nx={nx} fits "
            f"{vmem_budget/1e6:.0f} MB VMEM at ny={ny}")
    ntx = nx // bx
    dtohs = [float(dt / h[a]) for a in range(2)]
    specs = tuple(correctors) if correctors else ()
    if specs and len(axes_seq) > 1:
        raise ValueError("fused_step_2d: folded correctors require a "
                         "single step per window (len(axes_seq) == 1)")
    naux = aux.shape[0] if (specs and aux is not None) else 0
    if specs and any(s[0] == "damage" for s in specs) and aux is None:
        raise ValueError("damage correctors need the aux array")
    kernel, X = _make_2d_kernel(
        model, order, dtohs, borders, axes_seq, bx, nx, ny, nm, ntx,
        correctors=specs, naux=naux, dt_corr=float(dt))

    nsegs = 3 if len(axes_seq) * r > 0 else 1
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = pl.BlockSpec((C, bx, ny), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, nx, ny), u.dtype)
    operands = (u, mstack)
    if naux:
        in_specs.append(pl.BlockSpec((naux, bx, ny), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((naux, bx, ny), lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((naux, nx, ny), aux.dtype)]
        operands = (u, mstack, aux)
    out = pl.pallas_call(
        kernel,
        grid=(ntx,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, C, X, ny), u.dtype),
            pltpu.VMEM((2, nm, X, ny), mstack.dtype),
            pltpu.SemaphoreType.DMA((2, nsegs)),
            pltpu.SemaphoreType.DMA((2, nsegs)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024,
                                 vmem_budget + 32 * 1024 * 1024),
        ),
        **({"interpret": True} if default_interpret(interpret=interpret)
           else {}),
    )(*operands)
    return out


def _pick_tile(n: int, want: int, mult: int) -> int:
    """Largest divisor of n that is <= want and a multiple of ``mult``
    (falls back to n itself when none divides)."""
    best = None
    for c in range(min(want, n), 0, -1):
        if n % c == 0 and c % mult == 0:
            best = c
            break
    return best if best is not None else n


def _norm_axes_seq(axes, axes_seq, dim: int):
    """Normalize the (axes, axes_seq) pair to a validated axes_seq tuple."""
    fwd = tuple(range(dim))
    if axes_seq is None:
        axes_seq = (tuple(axes) if axes is not None else fwd,)
    else:
        if axes is not None:
            raise ValueError("pass either axes or axes_seq, not both")
        axes_seq = tuple(tuple(a) for a in axes_seq)
    for ax in axes_seq:
        if ax not in (fwd, fwd[::-1]):
            raise ValueError(f"unsupported axes order {ax}")
    return axes_seq


def fused_step(
    model: Model,
    u: jnp.ndarray,
    mstack: jnp.ndarray,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    axes: Optional[Sequence[int]] = None,
    bx: int = 32,
    by: int = 64,
    interpret: Optional[bool] = None,
    vmem_budget: int = 64 * 1024 * 1024,
    axes_seq: Optional[Sequence[Sequence[int]]] = None,
    correctors: Optional[Tuple] = None,
    aux: Optional[jnp.ndarray] = None,
):
    """One full 3D time step as a single fused Pallas kernel — or, with
    ``axes_seq`` of length K, K consecutive time steps per HBM pass
    (temporal blocking: the window carries a K*r halo and each
    intermediate step recomputes its halo in VMEM, cutting state traffic
    per step ~K-fold at the cost of K× VPU work — VERDICT r3 item 1).
    ``axes_seq=((0,1,2),(2,1,0))`` is the engine's symmetrized pair.

    ``mstack`` is ``stack_mats(model, mat)`` — build it once at setup.
    Falls back (raises ValueError) for unsupported configurations; callers
    (engine) catch the constraints statically.

    bf16 material stacks route through the slab kernel: bf16 HBM refs are
    (8,128)-tiled with 2-sublane packing, so the windowed kernel's r-row
    y-halo segment DMAs are unalignable for Mosaic; the slab kernel
    segments along x only (the untiled dim) and is measured at the same
    DMA roofline.
    """
    if u.ndim == 4 and mstack.dtype == jnp.bfloat16:
        # bf16 stacks route through the slab kernel (see docstring), which
        # folds correctors too — bf16 viscoelastic steps are single-pass
        # (VERDICT r4 weak #4)
        return fused_step_slab(model, u, mstack, dt, h, order, borders,
                               axes, interpret=interpret,
                               vmem_budget=max(vmem_budget,
                                               96 * 1024 * 1024),
                               axes_seq=axes_seq,
                               correctors=correctors, aux=aux)
    _require_lane_alignment(u.shape[-1], interpret, "fused_step")
    if u.ndim != 4 or model.dim != 3:
        raise ValueError("fused_step supports 3D grids only")
    axes_seq = _norm_axes_seq(axes, axes_seq, 3)
    C, nx, ny, nz = u.shape
    nm = mstack.shape[0]
    r = stencil_radius(order)
    halo = len(axes_seq) * r

    # tile-size selection under a VMEM budget: double-buffered input
    # windows + pipelined output blocks + compute temporaries.
    budget = vmem_budget
    esz = u.dtype.itemsize

    def vmem_need(bx_, by_):
        X_, Y_ = bx_ + 2 * halo, by_ + 2 * halo
        win = 2 * (C + nm) * X_ * Y_ * nz * esz
        out = 2 * C * bx_ * by_ * nz * esz
        tmp = 6 * X_ * Y_ * nz * esz
        return win + out + tmp

    bx = _pick_tile(nx, bx, 1)
    by = _pick_tile(ny, by, 8 if ny % 8 == 0 else 1)
    while vmem_need(bx, by) > budget and (bx > 1 or by > 8):
        if by >= max(bx, 16):
            by = _pick_tile(ny, max(by // 2, 1), 8 if ny % 8 == 0 else 1)
        else:
            bx = _pick_tile(nx, max(bx // 2, 1), 1)
        if bx <= 1 and by <= 8:
            break
    # tiles smaller than the halo break the clamped 3x3 segment DMAs: a
    # NON-edge tile whose window crosses the domain face reads clamped
    # in-bounds-but-wrong rows and the edge patch (keyed on ix==0 /
    # ix==ntx-1) never fires for it — silently wrong near-boundary
    # results (advisor r4).  Raise so callers fall back.
    if halo > 0 and (bx < halo or by < halo):
        raise ValueError(
            f"fused_step: tile ({bx},{by}) smaller than halo {halo} "
            f"(VMEM pressure at nz={nz}); use fused_step_slab or the "
            "per-sweep pallas path")

    ntx, nty = nx // bx, ny // by
    dtohs = [float(dt / h[a]) for a in range(3)]

    specs = tuple(correctors) if correctors else ()
    if specs and len(axes_seq) > 1:
        # split-step semantics apply the corrector after EVERY step; the
        # epilogue runs once per window, so temporal blocking + folded
        # correctors would silently diverge (advisor r4)
        raise ValueError("fused_step: folded correctors require a single "
                         "step per window (len(axes_seq) == 1)")
    naux = aux.shape[0] if (specs and aux is not None) else 0
    if specs and any(s[0] == "damage" for s in specs) and aux is None:
        raise ValueError("damage correctors need the aux array")
    kernel, X, Y = _make_fused_kernel(
        model, order, dtohs, borders, axes_seq, bx, by, nx, ny, nz, nm,
        ntx, nty, correctors=specs, naux=naux, dt_corr=float(dt))

    nsegs = 9 if halo > 0 else 1
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = pl.BlockSpec((C, bx, by, nz), lambda i, j: (0, i, j, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, nx, ny, nz), u.dtype)
    operands = (u, mstack)
    if naux:
        in_specs.append(pl.BlockSpec((naux, bx, by, nz),
                                     lambda i, j: (0, i, j, 0),
                                     memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((naux, bx, by, nz),
                                  lambda i, j: (0, i, j, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((naux, nx, ny, nz), aux.dtype)]
        operands = (u, mstack, aux)
    out = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, C, X, Y, nz), u.dtype),
            pltpu.VMEM((2, nm, X, Y, nz), mstack.dtype),
            pltpu.SemaphoreType.DMA((2, nsegs)),
            pltpu.SemaphoreType.DMA((2, nsegs)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024,
                                 vmem_budget + 32 * 1024 * 1024),
        ),
        # omit the kwarg when False so test harnesses can monkeypatch a
        # default interpret=True for the CPU backend
        **({"interpret": True} if default_interpret(interpret=interpret)
           else {}),
    )(*operands)
    return out
