"""Characteristic border conditions as masked boundary-slab corrections.

TPU-native counterpart of the reference's border correctors (SURVEY.md §2
component 10; §0.4). At a domain face, the invariant *leaving* the domain
(w_L at a low face never leaves — see below) is known from the interior
interpolation; the invariant *entering* is chosen to satisfy the physical
constraint. With the pair convention of gcm_tpu.models.spec:

- ``w_L = A + s z B`` rides speed −c → enters at the HIGH face, leaves at
  the LOW face;
- ``w_R = A − s z B`` rides speed +c → enters at the LOW face.

Low face (side=0), known outgoing ``w_L``:
    absorbing       : w_R = 0
    free            : A = 0      → w_R = −w_L
    fixed_force  F  : A = F      → w_R = 2F − w_L
    fixed_velocity V: B = V      → w_R = w_L − 2 s z V
High face (side=1) mirrors with L↔R and ``w_L = w_R + 2 s z V``.

These are exact characteristic BCs (not sponge layers): the absorbing face
is perfectly non-reflecting for normal incidence, and the free face enforces
zero traction to round-off. All ops are slab reads + ``.at[].set`` writes —
under GSPMD they land only on the edge shards.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gcm_tpu.task import BorderSpec


def face_index(ax: int, side: int) -> Tuple:
    """Index tuple selecting the boundary slab of a spatial-rank array."""
    return (slice(None),) * ax + (0 if side == 0 else -1,)


def correct_pair_at_face(
    w_l: jnp.ndarray,
    w_r: jnp.ndarray,
    z: jnp.ndarray,
    sign: int,
    bc: BorderSpec,
    ax: int,
    side: int,
    value: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Overwrite the incoming invariant of one pair on one face."""
    idx = face_index(ax, side)
    z_b = z[idx]
    if side == 0:
        out = w_l[idx]
        if bc.kind == "absorbing":
            inc = jnp.zeros_like(out)
        elif bc.kind == "free":
            inc = -out
        elif bc.kind == "fixed_force":
            inc = 2.0 * value - out
        elif bc.kind == "fixed_velocity":
            inc = out - 2.0 * sign * z_b * value
        else:  # pragma: no cover
            raise ValueError(bc.kind)
        return w_l, w_r.at[idx].set(inc)
    else:
        out = w_r[idx]
        if bc.kind == "absorbing":
            inc = jnp.zeros_like(out)
        elif bc.kind == "free":
            inc = -out
        elif bc.kind == "fixed_force":
            inc = 2.0 * value - out
        elif bc.kind == "fixed_velocity":
            inc = out + 2.0 * sign * z_b * value
        else:  # pragma: no cover
            raise ValueError(bc.kind)
        return w_l.at[idx].set(inc), w_r
