"""Contact and fracture between bodies: paired characteristic face solves.

TPU-native counterpart of the reference's ``ContactCondition`` + fracture
(SURVEY.md §2 component 11; BASELINE.json config 4 "free-surface +
contact/fracture"). Two bodies meet along a shared grid-conforming face
(body_a's high face ↔ body_b's low face on the contact axis, collocated
interface nodes). During the sweep along the contact axis, the incoming
invariant of each body's face is set from the *two-impedance interface
solve* instead of a border condition:

With elastic pairs (sign s = +1), known outgoing invariants at the face
    a = w_R of body_a (= sigma* − z_a v*),   b = w_L of body_b (= sigma* + z_b v*)
adhesion (continuity of traction & velocity) gives
    v*     = (b − a) / (z_a + z_b)
    sigma* = (z_b a + z_a b) / (z_a + z_b)
and the incoming invariants  w_L(a-side) = sigma* + z_a v*,
                             w_R(b-side) = sigma* − z_b v*.

Kinds:
- ``bonded``: adhesion on all pairs (P and S);
- ``slip``:   adhesion on the normal (P) pair, tangential tractions zero
              (free) on both sides;
- fracture:   a per-interface-node ``bonded`` state array flips to broken
              (slip or full free) where the interface normal traction
              exceeds a tensile strength; broken is permanent.

Everything is dense masked math on interface slabs: the per-face state is a
float mask carried in the step pytree, so fracture evolution stays inside
jit (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from gcm_tpu.solver.boundary import face_index

CONTACT_KINDS = ("bonded", "slip")


@dataclasses.dataclass(frozen=True)
class ContactSpec:
    """Contact between body_a's high face and body_b's low face on ``axis``.

    ``tensile_strength``: if set, fracture is enabled — interface nodes
    whose normal traction sigma* exceeds it (tension-positive) become
    permanently broken and behave as ``broken_kind`` ('free' = traction-free
    crack faces, 'slip' = frictionless contact that still transmits
    compression).
    """

    body_a: str
    body_b: str
    axis: int
    kind: str = "bonded"
    tensile_strength: Optional[float] = None
    broken_kind: str = "free"

    def __post_init__(self):
        if self.kind not in CONTACT_KINDS:
            raise ValueError(f"unknown contact kind {self.kind!r}")
        if self.broken_kind not in ("free", "slip"):
            raise ValueError(f"unknown broken kind {self.broken_kind!r}")


def _adhesion(a, b, z_a, z_b):
    """Interface solve: returns (w_in_a, w_in_b) = (sigma*+z_a v*, sigma*−z_b v*)."""
    denom = jnp.maximum(z_a + z_b, 1e-30)
    v_star = (b - a) / denom
    s_star = (z_b * a + z_a * b) / denom
    return s_star + z_a * v_star, s_star - z_b * v_star, s_star


def contact_face_update(
    spec: ContactSpec,
    is_normal: bool,
    w_l_a: jnp.ndarray,
    w_r_a: jnp.ndarray,
    w_l_b: jnp.ndarray,
    w_r_b: jnp.ndarray,
    z_a_field: jnp.ndarray,
    z_b_field: jnp.ndarray,
    bonded: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Apply the contact solve on the interface slabs of one pair's invariants.

    ``is_normal`` marks the pair whose traction acts along the contact axis
    (the P pair for isotropic media); ``z_*_field`` are each body's per-node
    impedance fields of this pair for this sweep, taken from its ``AxisView``
    — so the same solve serves isotropic and orthotropic bodies (the view is
    the single anisotropy point, gcm_tpu.materials).

    Returns updated (w_l_a, w_r_b is unchanged...) — concretely: body_a's
    incoming is w_L at its high face; body_b's incoming is w_R at its low
    face. Also returns the interface normal traction sigma* (only for the
    normal pair; used by the fracture criterion), else None.
    """
    ax = spec.axis
    idx_a = face_index(ax, 1)   # body_a high face
    idx_b = face_index(ax, 0)   # body_b low face
    z_a = z_a_field[idx_a]
    z_b = z_b_field[idx_b]
    out_a = w_r_a[idx_a]        # outgoing at high face
    out_b = w_l_b[idx_b]        # outgoing at low face

    # glued interface solve and traction-free (crack face) behavior
    in_a_glued, in_b_glued, s_star = _adhesion(out_a, out_b, z_a, z_b)
    in_a_free = -out_a
    in_b_free = -out_b

    # intact behavior per kind: 'bonded' glues all pairs; 'slip' glues only
    # the normal pair and leaves tangential tractions free
    if spec.kind == "slip" and not is_normal:
        intact_a, intact_b = in_a_free, in_b_free
    else:
        intact_a, intact_b = in_a_glued, in_b_glued

    if bonded is None:
        in_a, in_b = intact_a, intact_b
    else:
        # broken behavior: 'free' cracks are traction-free; 'slip' cracks
        # still transmit compression on the normal pair (unilateral contact)
        if spec.broken_kind == "slip" and is_normal:
            closed = s_star < 0.0
            broken_a = jnp.where(closed, in_a_glued, in_a_free)
            broken_b = jnp.where(closed, in_b_glued, in_b_free)
        else:
            broken_a, broken_b = in_a_free, in_b_free
        glue = bonded > 0.5
        in_a = jnp.where(glue, intact_a, broken_a)
        in_b = jnp.where(glue, intact_b, broken_b)

    w_l_a = w_l_a.at[idx_a].set(in_a)
    w_r_b = w_r_b.at[idx_b].set(in_b)
    return w_l_a, w_r_b, (s_star if is_normal else None)


def update_bonded(
    spec: ContactSpec, bonded: jnp.ndarray, s_star: jnp.ndarray
) -> jnp.ndarray:
    """Fracture criterion: break permanently where tension exceeds strength."""
    if spec.tensile_strength is None:
        return bonded
    still = (s_star <= spec.tensile_strength).astype(bonded.dtype)
    return bonded * still
