"""Contact and fracture between bodies: paired characteristic face solves.

TPU-native counterpart of the reference's ``ContactCondition`` + fracture
(SURVEY.md §2 component 11; BASELINE.json config 4 "free-surface +
contact/fracture"). Two bodies meet along a grid-conforming interface
(body_a's high face ↔ body_b's low face on the contact axis, collocated
interface nodes). The interface may cover the **whole face** of both bodies
(the round-1 scope) or an **offset sub-rectangle** of each face
(``lo_a``/``lo_b``/``span``): face nodes outside the overlap keep the
body's own border condition — e.g. the exposed ledge of a step is a free
surface.

During the sweep along the contact axis, the incoming invariant of each
body's face is set from the *two-impedance interface solve* instead of a
border condition.  With elastic pairs (sign s = +1), known outgoing
invariants at the face
    a = w_R of body_a (= sigma* − z_a v*),   b = w_L of body_b (= sigma* + z_b v*)
adhesion (continuity of traction & velocity) gives
    v*     = (b − a) / (z_a + z_b)
    sigma* = (z_b a + z_a b) / (z_a + z_b)
and the incoming invariants  w_L(a-side) = sigma* + z_a v*,
                             w_R(b-side) = sigma* − z_b v*.

Kinds:
- ``bonded``:   adhesion on all pairs (P and S);
- ``slip``:     adhesion on the normal (P) pair, tangential tractions zero
                (free) on both sides;
- ``friction``: Coulomb contact — the normal pair is **unilateral**
                (adhesion while in compression, traction-free when the
                interface opens), each tangential pair *sticks* (adhesion)
                while the stick traction satisfies |tau*| <= mu·max(−sigma_n*, 0)
                and *slides* at the capped traction
                tau_c = sign(tau*)·mu·max(−sigma_n*, 0) otherwise.  The cap
                is applied per tangential component — the axis-split
                approximation consistent with dimensional splitting.
- fracture:     a per-interface-node ``bonded`` state array flips to broken
                (slip or full free) where the interface normal traction
                exceeds a tensile strength; broken is permanent.

Everything is dense masked math on interface slabs: the per-face state is a
float mask carried in the step pytree, so fracture evolution stays inside
jit (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp

CONTACT_KINDS = ("bonded", "slip", "friction")


@dataclasses.dataclass(frozen=True)
class ContactSpec:
    """Contact between body_a's high face and body_b's low face on ``axis``.

    ``lo_a``/``lo_b``/``span`` (transverse node index tuples, one entry per
    non-contact axis in increasing-axis order) restrict the interface to a
    sub-rectangle of each face: body_a's nodes ``lo_a : lo_a+span`` are
    collocated with body_b's ``lo_b : lo_b+span``.  ``None`` means full
    faces (requires equal transverse shapes).

    ``tensile_strength``: if set, fracture is enabled — interface nodes
    whose normal traction sigma* exceeds it (tension-positive) become
    permanently broken and behave as ``broken_kind`` ('free' = traction-free
    crack faces, 'slip' = frictionless contact that still transmits
    compression).

    ``friction_mu``: Coulomb coefficient for ``kind='friction'``.
    """

    body_a: str
    body_b: str
    axis: int
    kind: str = "bonded"
    tensile_strength: Optional[float] = None
    broken_kind: str = "free"
    lo_a: Optional[Tuple[int, ...]] = None
    lo_b: Optional[Tuple[int, ...]] = None
    span: Optional[Tuple[int, ...]] = None
    friction_mu: float = 0.0

    def __post_init__(self):
        if self.kind not in CONTACT_KINDS:
            raise ValueError(f"unknown contact kind {self.kind!r}")
        if self.broken_kind not in ("free", "slip"):
            raise ValueError(f"unknown broken kind {self.broken_kind!r}")
        given = (self.lo_a, self.lo_b, self.span)
        if any(g is not None for g in given) and any(g is None for g in given):
            raise ValueError("lo_a, lo_b and span must be given together")


def face_sub_index(ax: int, side: int, dim: int,
                   lo: Optional[Tuple[int, ...]],
                   span: Optional[Tuple[int, ...]]) -> Tuple:
    """Index tuple selecting the (sub-rectangle of the) boundary face."""
    idx = []
    t = 0
    for d in range(dim):
        if d == ax:
            idx.append(0 if side == 0 else -1)
        elif lo is None:
            idx.append(slice(None))
        else:
            idx.append(slice(lo[t], lo[t] + span[t]))
            t += 1
    return tuple(idx)


def _adhesion(a, b, z_a, z_b):
    """Interface solve: returns (w_in_a, w_in_b, sigma*) for the glued case."""
    denom = jnp.maximum(z_a + z_b, 1e-30)
    v_star = (b - a) / denom
    s_star = (z_b * a + z_a * b) / denom
    return s_star + z_a * v_star, s_star - z_b * v_star, s_star


def apply_contact(
    spec: ContactSpec,
    dim: int,
    pairs_a: Dict[int, tuple],
    pairs_b: Dict[int, tuple],
    view_a,
    view_b,
    bonded: Optional[jnp.ndarray],
) -> Tuple[Dict[int, tuple], Dict[int, tuple], Optional[jnp.ndarray]]:
    """Apply one contact's interface solves to both bodies' invariants.

    ``pairs_*``: pair_index -> (w_l, w_r, PairSpec) full-domain invariant
    arrays from the raw sweep along ``spec.axis``.  The normal pair is
    solved first (its sigma* feeds the unilateral/friction/fracture
    logic of the tangential pairs), then each tangential pair.  Returns the
    updated dicts and the new bonded mask (or None).
    """
    ax = spec.axis
    idx_a = face_sub_index(ax, 1, dim, spec.lo_a, spec.span)
    idx_b = face_sub_index(ax, 0, dim, spec.lo_b, spec.span)

    keys = sorted(pairs_a)
    normal_k = [k for k in keys if pairs_a[k][2].traction_axis == ax]
    tangential_k = [k for k in keys if k not in normal_k]

    glue = (bonded > 0.5) if bonded is not None else None
    s_star_n = None
    sigma_c = None

    def solve_pair(k, is_normal):
        nonlocal s_star_n, sigma_c
        w_l_a, w_r_a, p = pairs_a[k]
        w_l_b, w_r_b, pb = pairs_b[k]
        z_a = view_a.pair_z[k][idx_a]
        z_b = view_b.pair_z[k][idx_b]
        out_a = w_r_a[idx_a]        # outgoing at body_a's high face
        out_b = w_l_b[idx_b]        # outgoing at body_b's low face

        in_a_glued, in_b_glued, s_star = _adhesion(out_a, out_b, z_a, z_b)
        in_a_free = -out_a
        in_b_free = -out_b

        if is_normal:
            s_star_n = s_star
            sigma_c = jnp.maximum(-s_star, 0.0)

        # intact behavior by kind
        if spec.kind == "bonded":
            intact_a, intact_b = in_a_glued, in_b_glued
        elif spec.kind == "slip":
            if is_normal:
                intact_a, intact_b = in_a_glued, in_b_glued
            else:
                intact_a, intact_b = in_a_free, in_b_free
        else:  # friction
            if is_normal:
                closed = s_star < 0.0
                intact_a = jnp.where(closed, in_a_glued, in_a_free)
                intact_b = jnp.where(closed, in_b_glued, in_b_free)
            else:
                # Coulomb: stick while |tau*| <= mu*sigma_c, else slide at
                # the capped traction (prescribed equal traction both sides)
                cap = spec.friction_mu * sigma_c
                stick = jnp.abs(s_star) <= cap
                tau_c = jnp.sign(s_star) * cap
                in_a_slide = 2.0 * tau_c - out_a
                in_b_slide = 2.0 * tau_c - out_b
                intact_a = jnp.where(stick, in_a_glued, in_a_slide)
                intact_b = jnp.where(stick, in_b_glued, in_b_slide)

        if glue is None:
            in_a, in_b = intact_a, intact_b
        else:
            # broken behavior: 'free' cracks are traction-free; 'slip'
            # cracks still transmit compression on the normal pair
            if spec.broken_kind == "slip" and is_normal:
                closed = s_star < 0.0
                broken_a = jnp.where(closed, in_a_glued, in_a_free)
                broken_b = jnp.where(closed, in_b_glued, in_b_free)
            else:
                broken_a, broken_b = in_a_free, in_b_free
            in_a = jnp.where(glue, intact_a, broken_a)
            in_b = jnp.where(glue, intact_b, broken_b)

        pairs_a[k] = (w_l_a.at[idx_a].set(in_a), w_r_a, p)
        pairs_b[k] = (w_l_b, w_r_b.at[idx_b].set(in_b), pb)

    for k in normal_k:
        solve_pair(k, True)
    for k in tangential_k:
        solve_pair(k, False)

    new_bonded = bonded
    if bonded is not None and s_star_n is not None \
            and spec.tensile_strength is not None:
        still = (s_star_n <= spec.tensile_strength).astype(bonded.dtype)
        new_bonded = bonded * still
    return pairs_a, pairs_b, new_bonded
