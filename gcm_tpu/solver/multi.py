"""Multi-body stepping: per-body sweeps stitched by contact solves.

TPU-native counterpart of the reference Engine's multi-mesh handling
(SURVEY.md §3.1 "contact correction between meshes"). All bodies advance
each sweep together; on sweeps along a contact's axis, the two bodies'
interface faces exchange outgoing invariants and receive the contact solve
instead of a border condition. Bodies live in one dict pytree, so a single
jit covers the whole system and XLA schedules bodies concurrently.

Bodies must share the model and interpolation order; each body has its own
grid shape, materials (isotropic or orthotropic — anything exposing
``axis_view``), and border conditions. Contact interfaces must be
grid-conforming (collocated nodes, equal transverse shape/spacing).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp

from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import Model
from gcm_tpu.ops.stage import (
    apply_zero_invariants, reconstruct_pair, stage_pair_updates,
)
from gcm_tpu.solver.boundary import correct_pair_at_face
from gcm_tpu.solver.contact import ContactSpec, contact_face_update, update_bonded
from gcm_tpu.task import BorderSpec

BodyStates = Dict[str, jnp.ndarray]
BondedState = Dict[int, jnp.ndarray]   # contact index -> interface mask


def stage_multi(
    model: Model,
    us: BodyStates,
    mats: Dict[str, MaterialFields],
    dt: float,
    hs: Dict[str, Sequence[float]],
    axis: int,
    order: int,
    borders: Dict[str, Dict[Tuple[int, int], BorderSpec]],
    contacts: Sequence[ContactSpec],
    bonded: BondedState,
) -> Tuple[BodyStates, BondedState]:
    """One sweep along ``axis`` for every body, with contact coupling."""
    # 1. raw invariant updates per body
    pair_ws: Dict[str, Dict[int, tuple]] = {}
    views = {}
    st = model.stage(axis)
    for name, u in us.items():
        views[name] = mats[name].axis_view(axis, st)
        pair_ws[name] = stage_pair_updates(
            model, u, views[name], dt / hs[name][axis], axis, order)

    # faces consumed by a contact (border conditions must not touch them)
    contact_faces = set()
    for ci, c in enumerate(contacts):
        if c.axis == axis:
            contact_faces.add((c.body_a, axis, 1))
            contact_faces.add((c.body_b, axis, 0))

    # 2. contact solves on this axis
    new_bonded = dict(bonded)
    for ci, c in enumerate(contacts):
        if c.axis != axis:
            continue
        bmask = bonded.get(ci)
        s_star_p = None
        for k in sorted(pair_ws[c.body_a]):
            w_l_a, w_r_a, p = pair_ws[c.body_a][k]
            w_l_b, w_r_b, pb = pair_ws[c.body_b][k]
            assert p.wave == pb.wave
            # per-pair impedance fields from the axis views — the solve is
            # anisotropy-agnostic (isotropic and orthotropic bodies alike)
            w_l_a, w_r_b, s_star = contact_face_update(
                c, p.traction_axis == c.axis, w_l_a, w_r_a, w_l_b, w_r_b,
                views[c.body_a].pair_z[k], views[c.body_b].pair_z[k], bmask,
            )
            pair_ws[c.body_a][k] = (w_l_a, w_r_a, p)
            pair_ws[c.body_b][k] = (w_l_b, w_r_b, pb)
            if s_star is not None:
                s_star_p = s_star
        if bmask is not None and s_star_p is not None:
            new_bonded[ci] = update_bonded(c, bmask, s_star_p)

    # 3. border corrections on non-contact faces, then reconstruction
    out: BodyStates = {}
    for name, u in us.items():
        view = views[name]
        comps: Dict[int, jnp.ndarray] = {}
        for k, (w_l, w_r, p) in pair_ws[name].items():
            z = view.pair_z[k]
            for side in (0, 1):
                if (name, axis, side) in contact_faces:
                    continue
                bc = borders.get(name, {}).get((axis, side))
                if bc is not None:
                    val = bc.pair_value(p.traction_axis, axis)
                    w_l, w_r = correct_pair_at_face(
                        w_l, w_r, z, model.sign, bc, axis, side, val
                    )
            A_new, B_new = reconstruct_pair(w_l, w_r, z, u[p.vel], model.sign)
            comps[p.sigma] = A_new
            comps[p.vel] = B_new
        apply_zero_invariants(model, u, comps, view, axis)
        out[name] = jnp.stack([comps.get(i, u[i]) for i in range(model.ncomp)])
    return out, new_bonded


def step_multi(
    model: Model,
    us: BodyStates,
    mats: Dict[str, MaterialFields],
    dt: float,
    hs: Dict[str, Sequence[float]],
    order: int,
    borders: Dict[str, Dict[Tuple[int, int], BorderSpec]],
    contacts: Sequence[ContactSpec],
    bonded: BondedState,
    axes: Optional[Sequence[int]] = None,
) -> Tuple[BodyStates, BondedState]:
    if axes is None:
        axes = range(model.dim)
    for a in axes:
        us, bonded = stage_multi(
            model, us, mats, dt, hs, a, order, borders, contacts, bonded
        )
    return us, bonded
