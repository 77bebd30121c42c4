"""Fused compressed-stencil simplex sweep: one Pallas pass per stage.

The jnp compressed-stencil sweep (gcm_tpu.solver.simplex_gcm) executes
``|D|`` separate XLA ``jnp.roll`` ops per foot table — every roll a full
HBM read+write of the table's ``[m, N]`` component rows, so state traffic
is ~``|D|``x the state size per table (VERDICT r4 weak #1).  This kernel
applies the structured path's round-2 lesson to the unstructured sweep:

- the node vector is stored PADDED as ``[*, R, L]`` (``R*L >= N``, ``L`` a
  lane multiple of 128);
- a grid step DMAs one ``RB``-row block of the state plus a ``H``-row halo
  (``H = ceil(Dmax/L)+1`` covers every stencil delta) into VMEM once,
  double-buffered across grid steps;
- every weighted roll of every table of the sweep happens in-VMEM: a roll
  by delta ``d = q*L + s`` is a ``pltpu.roll`` lane rotate (cached per
  (comp, s) — measured ~free on v5e) plus a two-row select — no HBM
  re-reads, no TPU gathers (Mosaic rejects lane-misaligned
  slice+concat, so rolls are the only lowering that compiles);
- the pair/zero characteristic algebra and the full border-condition set
  (uniform kind or per-node NodeBorders) run on the block, and the state
  is written once.

Out-of-hull feet need no separate mask stream: compressed tables zero the
weights of outside rows, so ``sum_d W[d, n]`` is exactly 1 inside and 0
outside — the kernel recovers the ``outside`` mask from the weight sums it
already computes.  Rows past ``N`` (padding) likewise read as outside and
relax to zero under the absorbing algebra; callers ignore them.

Reference counterpart: the simplex specialization of
``GridCharacteristicMethod::stage`` (SURVEY.md §2 component 9, §3.3) —
re-designed as a banded-stencil VMEM pipeline rather than a per-node
walk+interpolate loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import Model
from gcm_tpu.utils.backend import default_interpret

_Z_EPS = 1e-30


@dataclasses.dataclass
class StageTablePlan:
    """Static per-table data of one sweep: which deltas, which rows of the
    stacked weight array, which components the table serves."""

    key: Tuple
    deltas: Tuple[int, ...]          # static index deltas
    w_rows: Tuple[int, ...]          # rows of the stage W stack, len(deltas)
    comps: Tuple[int, ...]           # components this table interpolates


@dataclasses.dataclass
class StagePlan:
    axis: int
    tables: List[StageTablePlan]
    pair_tables: Dict[int, Tuple]    # pair index -> (key+, key-)
    W: jnp.ndarray                   # [ndA, R, L] stacked delta weights
    halo: int                        # H rows


@dataclasses.dataclass
class FusedSimplexPlan:
    """Everything static the fused sweeps need, built once at setup.

    ``mstack`` rows are (zp, zs, kappa) (zs row present only with shear);
    ``bc`` is None for a uniform border or (code [R, L] int32,
    val [dim, dim, R, L]) for per-node conditions (NodeBorders semantics:
    ``val[a, t]`` is the prescribed value for the pair with traction axis
    ``t`` in the sweep along ``a``)."""

    model: Model
    N: int
    R: int
    L: int
    stages: Dict[int, StagePlan]
    mstack: jnp.ndarray              # [nm, R, L]
    mat_rows: Tuple[str, ...]
    border_kind: str                 # uniform kind, or "node" when bc set
    border_vals: Optional[np.ndarray]  # [dim, dim] uniform pair values
    bc: Optional[Tuple[jnp.ndarray, jnp.ndarray]]

    def pad(self, u: jnp.ndarray) -> jnp.ndarray:
        """[C, N] (or [N]) node-vector -> padded [C, R, L] grid layout."""
        lead = u.shape[:-1]
        flat = jnp.concatenate(
            [u, jnp.zeros(lead + (self.R * self.L - self.N,), u.dtype)],
            axis=-1)
        return flat.reshape(lead + (self.R, self.L))

    def unpad(self, u3: jnp.ndarray) -> jnp.ndarray:
        lead = u3.shape[:-2]
        return u3.reshape(lead + (self.R * self.L,))[..., :self.N]


def _pick_layout(N: int, L: int = 128) -> Tuple[int, int]:
    # round the row count up to a multiple of 64 so the block size can be
    # chosen from {64, 128, ...} without a divisor hunt (pad rows carry
    # zero weights everywhere — they cost HBM space, not correctness;
    # 256-multiples measured slightly SLOWER, BASELINE.md r5 addendum).
    # Small meshes pay a relatively large pad tax here — engines'
    # "auto" mode keeps them on the jnp sweep (see the engine gates).
    R = -(-N // L)
    R = -(-R // 64) * 64
    return R, L


def build_fused_simplex_plan(
    model: Model,
    mat: MaterialFields,
    tables: Dict,
    border_kind: Union[str, object] = "absorbing",
    dtype=jnp.float32,
    L: int = 128,
) -> Optional[FusedSimplexPlan]:
    """Build the fused-sweep plan, or return None when the configuration
    cannot run fused (any uncompressed table, orthotropic media, an
    unsupported border object) — callers fall back to the jnp sweep.

    ``L`` must stay 128 on hardware: wider lane layouts (256/512) fail
    the Mosaic compile on the multi-tile VMEM window refs (measured on
    v5e, BASELINE.md round-5 lane-width sweep); interpret mode accepts
    any L.
    """
    from gcm_tpu.solver.simplex_gcm import NodeBorders
    from gcm_tpu.task import BorderSpec

    if not isinstance(mat, MaterialFields):
        return None          # ortho media keep the per-pair jnp path
    tabs = dict(tables)
    if not tabs or any(t.stencil is None for t in tabs.values()):
        return None
    N = int(next(iter(tabs.values())).ids.shape[0])
    R, L = _pick_layout(N, L)

    # border normalization
    bc = None
    border_vals = None
    if isinstance(border_kind, NodeBorders):
        kind = "node"
    elif isinstance(border_kind, (str, BorderSpec)):
        spec = (BorderSpec(border_kind) if isinstance(border_kind, str)
                else border_kind)
        kind = spec.kind
        border_vals = np.asarray(
            [[spec.pair_value(t, a) for t in range(model.dim)]
             for a in range(model.dim)], np.float64)
    else:
        return None

    def pad_rows(x, fill=0.0):
        x = np.asarray(x, np.float64)
        lead = x.shape[:-1]
        out = np.full(lead + (R * L,), fill, np.float64)
        out[..., :N] = x
        return out.reshape(lead + (R, L))

    stages: Dict[int, StagePlan] = {}
    for axis in range(model.dim):
        st = model.stage(axis)
        # table keys per pair, as in solver.simplex_gcm.simplex_stage
        pair_tables: Dict[int, Tuple] = {}
        table_comps: Dict[Tuple, List[int]] = {}
        for k, p in enumerate(st.pairs):
            key_p = ((axis, k, +1) if (axis, k, +1) in tabs
                     else (axis, p.wave, +1))
            if key_p not in tabs:
                continue          # wave family absent (fluid)
            pair_tables[k] = (key_p, key_p[:2] + (-1,))
            for key in pair_tables[k]:
                lst = table_comps.setdefault(key, [])
                for c in (p.sigma, p.vel):
                    if c not in lst:
                        lst.append(c)
        if not pair_tables:
            return None
        w_arrs = []
        tplans = []
        row = 0
        for key, clist in table_comps.items():
            deltas, W = tabs[key].stencil
            w_arrs.append(pad_rows(W))
            tplans.append(StageTablePlan(
                key=key,
                deltas=tuple(int(d) for d in deltas),
                w_rows=tuple(range(row, row + len(deltas))),
                comps=tuple(clist)))
            row += len(deltas)
        Wall = jnp.asarray(np.concatenate(w_arrs, axis=0), dtype=dtype)
        halo = max(
            max(-(min(t.deltas) // L), max(t.deltas) // L + 1)
            for t in tplans)
        stages[axis] = StagePlan(axis=axis, tables=tplans,
                                 pair_tables=pair_tables, W=Wall,
                                 halo=int(halo))

    mat_rows = ["zp"]
    marr = [pad_rows(np.asarray(mat.zp), fill=1.0)]
    has_s = bool(float(np.asarray(mat.zs).max()) > 0)
    if has_s:
        mat_rows.append("zs")
        marr.append(pad_rows(np.asarray(mat.zs), fill=1.0))
    if any(model.stage(a).zeros for a in range(model.dim)):
        mat_rows.append("kappa")
        marr.append(pad_rows(np.asarray(mat.kappa)))
    mstack = jnp.asarray(np.stack(marr), dtype=dtype)

    bc_arr = None
    if kind == "node":
        code = pad_rows(border_kind.kind.astype(np.float64))  # 0 = absorbing
        val = pad_rows(np.transpose(border_kind.value, (1, 2, 0)))
        bc_arr = (jnp.asarray(code.astype(np.int32)),
                  jnp.asarray(val, dtype=dtype))
    elif kind not in ("absorbing", "free", "fixed_force", "fixed_velocity"):
        return None

    return FusedSimplexPlan(
        model=model, N=N, R=R, L=L, stages=stages, mstack=mstack,
        mat_rows=tuple(mat_rows), border_kind=kind,
        border_vals=border_vals, bc=bc_arr)


# ---------------------------------------------------------------------- kernel

def _make_sweep_kernel(plan: FusedSimplexPlan, stage: StagePlan,
                       RB: int, nblocks: int):
    model = plan.model
    C = model.ncomp
    L = plan.L
    H = stage.halo
    sign = model.sign
    st = model.stage(stage.axis)
    mrow = {n: i for i, n in enumerate(plan.mat_rows)}
    node_bc = plan.border_kind == "node"

    def kernel(*refs):
        if node_bc:
            u_hbm, w_ref, m_ref, code_ref, val_ref, out_ref = refs[:6]
            uwin, sem = refs[6:]
        else:
            u_hbm, w_ref, m_ref, out_ref = refs[:4]
            code_ref = val_ref = None
            uwin, sem = refs[4:]
        i = pl.program_id(0)
        slot, nslot = i % 2, (i + 1) % 2

        # 3-segment window DMA (lo-halo / center / hi-halo), the structured
        # fused kernel's clamped-segment pattern: the center segment is
        # always exact, and a CLAMPED halo segment only ever feeds window
        # rows whose global row is outside [0, R) — positions every delta
        # reaches with structurally-zero weight, so in-bounds-but-wrong
        # rows there are harmless and no patching is needed (unlike the
        # state kernels, where clamped rows need edge replication)
        def dma(slot_, i_):
            lo = jnp.clip(i_ * RB - H, 0, plan.R - H)
            hi = jnp.clip(i_ * RB + RB, 0, plan.R - H)
            return [
                pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(lo, H), :],
                    uwin.at[slot_, :, pl.ds(0, H), :], sem.at[slot_, 0]),
                pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(i_ * RB, RB), :],
                    uwin.at[slot_, :, pl.ds(H, RB), :], sem.at[slot_, 1]),
                pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(hi, H), :],
                    uwin.at[slot_, :, pl.ds(H + RB, H), :],
                    sem.at[slot_, 2]),
            ]

        @pl.when(i == 0)
        def _():
            for op in dma(slot, i):
                op.start()

        @pl.when(i + 1 < nblocks)
        def _():
            for op in dma(nslot, i + 1):
                op.start()

        for op in dma(slot, i):
            op.wait()

        Wu = uwin[slot]           # [C, RB+2H, L]; row w = global i*RB-H+w

        # A roll by delta d = q*L + s (0 <= s < L) needs, at output row j
        # lane l, the window value at row H+q+j+(l+s >= L), lane (l+s)%L.
        # Lane-misaligned slice+concat does NOT lower on Mosaic
        # ("result/input offset mismatch on non-concat dimension"), so:
        # rotate the whole window by s ONCE per (comp, s) — pltpu.roll is
        # the native lane rotate — then select between the q and q+1 row
        # slices by lane position.  Rotations are cached across deltas
        # and tables (tables of one stage share their delta set).
        lane = jax.lax.broadcasted_iota(jnp.int32, (RB, L), 1)
        rot_cache: Dict[Tuple[int, int], jnp.ndarray] = {}

        def shifted(c, d):
            q, s = d // L, d % L
            if s == 0:
                return Wu[c, H + q:H + q + RB, :]
            rot = rot_cache.get((c, s))
            if rot is None:
                # rot[j, l] = Wu[c, j, (l+s) % L]
                rot = pltpu.roll(Wu[c], L - s, 1)
                rot_cache[(c, s)] = rot
            a = rot[H + q:H + q + RB]
            b = rot[H + q + 1:H + q + 1 + RB]
            return jnp.where(lane < L - s, a, b)

        # interpolate every table's components; outside = (sum W == 0)
        interp: Dict[Tuple, Dict[int, jnp.ndarray]] = {}
        outside: Dict[Tuple, jnp.ndarray] = {}
        shift_cache: Dict[Tuple[int, int], jnp.ndarray] = {}
        for t in stage.tables:
            accs = {c: None for c in t.comps}
            wsum = None
            for d, wr in zip(t.deltas, t.w_rows):
                w = w_ref[wr]
                wsum = w if wsum is None else wsum + w
                for c in t.comps:
                    sh = shift_cache.get((c, d))
                    if sh is None:
                        sh = shifted(c, d)
                        shift_cache[(c, d)] = sh
                    term = w * sh
                    accs[c] = term if accs[c] is None else accs[c] + term
            interp[t.key] = accs
            outside[t.key] = wsum < 0.5

        comps_new: Dict[int, jnp.ndarray] = {}
        u_blk = {c: shift_cache.get((c, 0)) for c in range(C)}

        def ublk(c):
            v = u_blk.get(c)
            if v is None:
                v = shifted(c, 0)
                u_blk[c] = v
            return v

        for k, p in enumerate(st.pairs):
            if k not in stage.pair_tables:
                continue
            key_p, key_m = stage.pair_tables[k]
            z = m_ref[mrow["zp" if p.wave == "p" else "zs"]]
            szb = sign * z
            ip, im = interp[key_p], interp[key_m]
            w_l = ip[p.sigma] + szb * ip[p.vel]
            w_r = im[p.sigma] - szb * im[p.vel]
            out_p, out_m = outside[key_p], outside[key_m]
            w_l0, w_r0 = w_l, w_r

            if node_bc:
                code = code_ref[0]
                val = val_ref[p.traction_axis]
                zero = jnp.zeros_like(w_l0)
                inc_l = jnp.where(
                    code == 0, zero, jnp.where(
                        code == 1, -w_r0, jnp.where(
                            code == 2, 2.0 * val - w_r0,
                            w_r0 + 2.0 * sign * z * val)))
                inc_r = jnp.where(
                    code == 0, zero, jnp.where(
                        code == 1, -w_l0, jnp.where(
                            code == 2, 2.0 * val - w_l0,
                            w_l0 - 2.0 * sign * z * val)))
                w_l = jnp.where(out_p, inc_l, w_l)
                w_r = jnp.where(out_m, inc_r, w_r)
            else:
                kind = plan.border_kind
                val = float(plan.border_vals[stage.axis, p.traction_axis])
                if kind == "absorbing":
                    w_l = jnp.where(out_p, 0.0, w_l)
                    w_r = jnp.where(out_m, 0.0, w_r)
                elif kind == "free":
                    w_l = jnp.where(out_p, -w_r0, w_l)
                    w_r = jnp.where(out_m, -w_l0, w_r)
                elif kind == "fixed_force":
                    w_l = jnp.where(out_p, 2.0 * val - w_r0, w_l)
                    w_r = jnp.where(out_m, 2.0 * val - w_l0, w_r)
                else:  # fixed_velocity
                    w_l = jnp.where(out_p, w_r0 + 2.0 * sign * z * val, w_l)
                    w_r = jnp.where(out_m, w_l0 - 2.0 * sign * z * val, w_r)

            A_new = 0.5 * (w_l + w_r)
            B_prop = sign * (w_l - w_r) / (2.0 * jnp.maximum(z, _Z_EPS))
            comps_new[p.sigma] = A_new
            comps_new[p.vel] = jnp.where(z > 0, B_prop, ublk(p.vel))

        for j, zc in enumerate(st.zeros):
            if zc.src in comps_new:
                kap = m_ref[mrow["kappa"]]
                comps_new[zc.comp] = ublk(zc.comp) + kap * (
                    comps_new[zc.src] - ublk(zc.src))

        for c in range(C):
            out_ref[c] = comps_new.get(c, ublk(c))

    return kernel


def fused_simplex_sweep(
    plan: FusedSimplexPlan,
    u3: jnp.ndarray,
    axis: int,
    RB: int = 256,
    interpret: Optional[bool] = None,
    vmem_budget: int = 64 * 1024 * 1024,
) -> jnp.ndarray:
    """One fused characteristic sweep over the padded [C, R, L] state."""
    stage = plan.stages[axis]
    C, R, L = u3.shape
    H = stage.halo
    ndA = stage.W.shape[0]
    nm = plan.mstack.shape[0]
    esz = u3.dtype.itemsize

    def vmem_need(rb):
        win = 2 * C * (rb + 2 * H) * L * esz          # double-buffered u
        stream = 2 * (ndA + nm + C) * rb * L * esz    # pipelined W/m/out
        tmp = 8 * rb * L * esz
        return win + stream + tmp

    if R < H:
        raise ValueError(
            "fused simplex sweep: stencil halo exceeds the mesh "
            f"({H} halo rows > {R} rows) — use the jnp sweep")
    # largest 64-multiple divisor of R within budget (R is a 64-multiple
    # by construction; _pick_layout).  RB must stay >= H: a clamped halo
    # segment of a block with RB < H would misalign IN-RANGE rows (the
    # same tile>=halo constraint the structured fused kernel enforces).
    RB = min(RB, R)
    RB = max(rb for rb in range(64, RB + 1, 64) if R % rb == 0) \
        if R >= 64 else R
    while RB > 64 and vmem_need(RB) > vmem_budget:
        cands = [rb for rb in range(64, RB, 64) if R % rb == 0 and rb >= H]
        if not cands:
            break
        RB = cands[-1]
    if RB < H:
        cands = [rb for rb in range(RB, R + 1, 64) if R % rb == 0
                 and rb >= H]
        if not cands:
            raise ValueError(
                f"fused simplex sweep: no block size >= halo {H} divides "
                f"R={R} — use the jnp sweep")
        RB = cands[0]
    nblocks = R // RB

    kernel = _make_sweep_kernel(plan, stage, RB, nblocks)
    win_rows = RB + 2 * H

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((ndA, RB, L), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nm, RB, L), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [u3, stage.W, plan.mstack]
    if plan.border_kind == "node":
        code, val = plan.bc
        in_specs.append(pl.BlockSpec((1, RB, L), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (plan.model.dim, RB, L), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM))
        operands += [code.reshape(1, R, L),
                     val[stage.axis].astype(u3.dtype)]

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C, RB, L), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, R, L), u3.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, C, win_rows, L), u3.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024,
                                 vmem_budget + 32 * 1024 * 1024),
        ),
        **({"interpret": True} if default_interpret(interpret=interpret)
           else {}),
    )(*operands)
    return out


def fused_simplex_step(
    plan: FusedSimplexPlan,
    u3: jnp.ndarray,
    axes: Optional[Sequence[int]] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """One full splitting step (all sweeps) on the padded state."""
    if axes is None:
        axes = range(plan.model.dim)
    for a in axes:
        u3 = fused_simplex_sweep(plan, u3, a, interpret=interpret)
    return u3
