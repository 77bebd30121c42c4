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

Scope: 3D grids, f32, isotropic ``MaterialFields``, orders 1..4, axes order
(0,1,2) or its reverse (the engine's symmetrized splitting).  Other cases
fall back to the per-sweep kernels.  Reference counterpart: the per-node
stage loop of ``GridCharacteristicMethod`` (SURVEY.md §3.2) — reimagined as
a single-pass, windowed, in-VMEM pipeline rather than a translation.
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

Borders = Dict[Tuple[int, int], BorderSpec]

_Z_EPS = 1e-30


# --------------------------------------------------------------- material stack

def mat_layout(model: Model) -> List[str]:
    """Names of the derived material fields the fused kernel reads, in
    stack order.  Isotropic media are axis-independent, so one stack serves
    all three sweeps.  ``r<w>`` is the precomputed half-reciprocal impedance
    ``0.5/z`` (0 where z == 0) — a multiply in the hot loop instead of a
    per-pair VPU divide."""
    waves = []
    for st in model.stages:
        for p in st.pairs:
            if p.wave not in waves:
                waves.append(p.wave)
    fields = ([f"c{w}" for w in waves] + [f"z{w}" for w in waves]
              + [f"r{w}" for w in waves])
    if any(st.zeros for st in model.stages):
        fields.append("kappa")
    return fields


def stack_mats(model: Model, mat: MaterialFields) -> jnp.ndarray:
    """Stack the needed per-node material fields into one (nm, *spatial)
    array.  Call once at setup — not inside the stepped loop."""
    zp = jnp.asarray(mat.zp)
    zs = jnp.asarray(mat.zs)

    def half_recip(z):
        return jnp.where(z > 0, 0.5 / jnp.maximum(z, _Z_EPS), 0.0)

    name_map = {"cp": mat.cp, "cs": mat.cs, "zp": zp, "zs": zs,
                "rp": half_recip(zp), "rs": half_recip(zs),
                "kappa": mat.kappa}
    return jnp.stack([jnp.asarray(name_map[f]) for f in mat_layout(model)])


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
) -> Tuple[List[jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One characteristic sweep over in-VMEM window arrays.

    ``comps``: per-component (X, Y, Z) arrays; ``mats``: field-name → array
    of the same extents.  ``trim=True`` consumes an r-cell halo along
    ``axis`` (output extent shrinks by 2r); ``trim=False`` keeps the full
    extent and edge-pads in-VMEM (the lane-axis sweep).  ``faces`` are
    traced (is_low_face, is_high_face) booleans of this tile.
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

    # per-wave Courant weights at the target nodes
    wts_by_wave = {}
    for p in st.pairs:
        if p.wave not in wts_by_wave:
            nu = region(mats[f"c{p.wave}"]) * dt_over_h
            wts_by_wave[p.wave] = stencil_weights(order, nu)
    offs_p = stencil_offsets(order, +1)
    offs_m = stencil_offsets(order, -1)

    def interp(fp, offs, wts):
        out = None
        for o, w_ in zip(offs, wts):
            t = w_ * _slab(fp, d, r + o, n_out)
            out = t if out is None else out + t
        return out

    new: Dict[int, jnp.ndarray] = {}
    for p in st.pairs:
        A_pad = pad(comps[p.sigma])
        B_pad = pad(comps[p.vel])
        wts = wts_by_wave[p.wave]
        z = region(mats[f"z{p.wave}"])
        szb = sign * z
        w_l = interp(A_pad, offs_p, wts) + szb * interp(B_pad, offs_p, wts)
        w_r = interp(A_pad, offs_m, wts) - szb * interp(B_pad, offs_m, wts)

        if borders is not None:
            for side in (0, 1):
                bc = borders.get((axis, side))
                if bc is None:
                    continue
                val = bc.pair_value(p.traction_axis, axis)
                mask = _row_mask(w_l.shape, d,
                                 lo=1 if side == 0 else None,
                                 hi=n_out - 1 if side == 1 else None)
                mask = mask & faces[side]
                out_w = w_l if side == 0 else w_r
                inc = _bc_incoming(out_w, bc.kind, val, sign, z, side)
                if side == 0:
                    w_r = jnp.where(mask, inc, w_r)
                else:
                    w_l = jnp.where(mask, inc, w_l)

        A_new = 0.5 * (w_l + w_r)
        B_old = region(comps[p.vel])
        rz = region(mats[f"r{p.wave}"])  # 0.5/z, 0 where z == 0
        B_prop = sign * (w_l - w_r) * rz
        new[p.sigma] = A_new
        new[p.vel] = jnp.where(z > 0, B_prop, B_old)

    for zc in st.zeros:
        kap = region(mats["kappa"])
        d_src = new[zc.src] - region(comps[zc.src])
        new[zc.comp] = region(comps[zc.comp]) + kap * d_src

    out_comps = [new.get(i, region(comps[i])) for i in range(model.ncomp)]
    out_mats = {k: region(v) for k, v in mats.items()}
    return out_comps, out_mats


# ---------------------------------------------------------------------- kernel

def _make_fused_kernel(model: Model, order: int, dtohs: Sequence[float],
                       borders: Optional[Borders], axes: Tuple[int, ...],
                       bx: int, by: int, nx: int, ny: int, nz: int,
                       nm: int, ntx: int, nty: int):
    C = model.ncomp
    r = stencil_radius(order)
    X, Y = bx + 2 * r, by + 2 * r
    mat_names = mat_layout(model)
    # DMA decomposition: 3x3 clamped segments (x-halo/center, y-halo/center).
    # Destination offsets are static; source offsets are clamped so edge
    # tiles read in-bounds-but-wrong rows, patched to edge replication below.
    segs = [(sx, sy) for sx in range(3) for sy in range(3)
            if not (r == 0 and (sx != 1 or sy != 1))]

    def _src_x(i, sx):
        if sx == 0:
            return jnp.clip(i * bx - r, 0, nx - r), r
        if sx == 1:
            return i * bx, bx
        return jnp.clip((i + 1) * bx, 0, nx - r), r

    def _src_y(j, sy):
        if sy == 0:
            return jnp.clip(j * by - r, 0, ny - r), r
        if sy == 1:
            return j * by, by
        return jnp.clip((j + 1) * by, 0, ny - r), r

    _dst_x = {0: (0, r), 1: (r, bx), 2: (r + bx, r)}
    _dst_y = {0: (0, r), 1: (r, by), 2: (r + by, r)}

    def kernel(u_hbm, m_hbm, out_ref, uwin, mwin, sem_u, sem_m):
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

        if r > 0:
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
                    win[slot, :, pl.ds(0, r)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(r, 1)], (nw, r, Y_, d_ext))

                @pl.when(hi_x)
                def _():
                    win[slot, :, pl.ds(X_ - r, r)] = jnp.broadcast_to(
                        win[slot, :, pl.ds(X_ - r - 1, 1)], (nw, r, Y_, d_ext))

                @pl.when(lo_y)
                def _():
                    win[slot, :, :, pl.ds(0, r)] = jnp.broadcast_to(
                        win[slot, :, :, pl.ds(r, 1)], (nw, X_, r, d_ext))

                @pl.when(hi_y)
                def _():
                    win[slot, :, :, pl.ds(Y_ - r, r)] = jnp.broadcast_to(
                        win[slot, :, :, pl.ds(Y_ - r - 1, 1)], (nw, X_, r, d_ext))

            _patch(uwin, C, nz)
            _patch(mwin, nm, nz)

        Wu = uwin[slot]
        Wm = mwin[slot]
        comps = [Wu[c] for c in range(C)]
        mats = {mat_names[k]: Wm[k] for k in range(nm)}

        faces_by_axis = {
            0: (lo_x, hi_x),
            1: (lo_y, hi_y),
            2: (True, True),
        }
        for a in axes:
            comps, mats = _sweep_window(
                model, comps, mats, a, order, dtohs[a], borders,
                faces_by_axis[a], trim=(a != 2),
            )

        for c in range(C):
            out_ref[c] = comps[c]

    return kernel, X, Y


def _pick_tile(n: int, want: int, mult: int) -> int:
    """Largest divisor of n that is <= want and a multiple of ``mult``
    (falls back to n itself when none divides)."""
    best = None
    for c in range(min(want, n), 0, -1):
        if n % c == 0 and c % mult == 0:
            best = c
            break
    return best if best is not None else n


def fused_step(
    model: Model,
    u: jnp.ndarray,
    mstack: jnp.ndarray,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    axes: Optional[Sequence[int]] = None,
    bx: int = 16,
    by: int = 32,
    interpret: bool = False,
    vmem_budget: int = 11 * 1024 * 1024,
) -> jnp.ndarray:
    """One full 3D time step as a single fused Pallas kernel.

    ``mstack`` is ``stack_mats(model, mat)`` — build it once at setup.
    Falls back (raises ValueError) for unsupported configurations; callers
    (engine) catch the constraints statically.
    """
    if u.ndim != 4 or model.dim != 3:
        raise ValueError("fused_step supports 3D grids only")
    axes = tuple(axes) if axes is not None else (0, 1, 2)
    if axes not in ((0, 1, 2), (2, 1, 0)):
        raise ValueError(f"unsupported axes order {axes}")
    C, nx, ny, nz = u.shape
    nm = mstack.shape[0]
    r = stencil_radius(order)

    # tile-size selection under a VMEM budget: double-buffered input
    # windows + pipelined output blocks + compute temporaries.
    budget = vmem_budget
    esz = u.dtype.itemsize

    def vmem_need(bx_, by_):
        X_, Y_ = bx_ + 2 * r, by_ + 2 * r
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

    ntx, nty = nx // bx, ny // by
    dtohs = [float(dt / h[a]) for a in range(3)]

    kernel, X, Y = _make_fused_kernel(
        model, order, dtohs, borders, axes, bx, by, nx, ny, nz, nm, ntx, nty)

    nsegs = 9 if r > 0 else 1
    out = pl.pallas_call(
        kernel,
        grid=(ntx, nty),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C, bx, by, nz), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, X, Y, nz), u.dtype),
            pltpu.VMEM((2, nm, X, Y, nz), u.dtype),
            pltpu.SemaphoreType.DMA((2, nsegs)),
            pltpu.SemaphoreType.DMA((2, nsegs)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        # omit the kwarg when False so test harnesses can monkeypatch a
        # default interpret=True for the CPU backend
        **({"interpret": True} if interpret else {}),
    )(u, mstack)
    return out
