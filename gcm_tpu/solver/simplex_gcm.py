"""Grid-characteristic method on simplex meshes: gather-based sweeps.

TPU-native counterpart of the reference's simplex GCM specialization
(SURVEY.md §2 component 9, §3.3; BASELINE config 5). Same pair/zero
characteristic algebra as the cubic solver (gcm_tpu.models.spec), but the
semi-Lagrangian interpolation is a barycentric gather over precomputed
static tables (gcm_tpu.grids.simplex.build_foot_tables) — ``jnp.take`` over
node arrays, fully static indices, TPU-compatible.

State layout: ``u[ncomp, N]``; material fields ``[N]``. Border conditions:
the full characteristic set (absorbing, free, fixed_force, fixed_velocity —
pass a kind string or a task.BorderSpec), applied where the characteristic
foot leaves the hull (the unstructured analogue of incoming-invariant
overwrites on boundary slabs).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp

from gcm_tpu.grids.simplex import FootTables
from gcm_tpu.materials import MaterialFields
from gcm_tpu.models.spec import Model

_Z_EPS = 1e-30


def _gather_interp(f: jnp.ndarray, ids: jnp.ndarray, wts: jnp.ndarray):
    """Barycentric interpolation: sum_j wts[:, j] * f[ids[:, j]]."""
    return (jnp.take(f, ids, axis=0) * wts).sum(axis=1)


def _border_kind_value(border_kind, pair, axis):
    """Normalize the border argument: a kind string or a BorderSpec.

    A BorderSpec applies its per-traction-axis value exactly as on
    structured faces (task.BorderSpec.pair_value).
    """
    if isinstance(border_kind, str):
        return border_kind, 0.0
    return border_kind.kind, border_kind.pair_value(pair.traction_axis, axis)


def simplex_stage(
    model: Model,
    u: jnp.ndarray,
    mat: MaterialFields,
    tables: Dict[Tuple, FootTables],
    axis: int,
    border_kind: str = "absorbing",
) -> jnp.ndarray:
    """One characteristic sweep along coordinate axis ``axis``.

    ``tables`` may be keyed ``(axis, wave, dir)`` (isotropic: one table per
    wave family) or ``(axis, pair_index, dir)`` (anisotropic: per-pair feet,
    built by grids.simplex.build_foot_tables_for_model). Impedances come
    from the material's ``axis_view`` — the same anisotropy point as the
    structured sweeps — so isotropic and orthotropic media share this code.
    """
    st = model.stage(axis)
    sign = model.sign
    view = mat.axis_view(axis, st)
    comps: Dict[int, jnp.ndarray] = {}

    for k, p in enumerate(st.pairs):
        key_p = (axis, k, +1) if (axis, k, +1) in tables else (axis, p.wave, +1)
        if key_p not in tables:
            continue  # wave family absent (e.g. S in a fluid)
        tp = tables[key_p]
        tm = tables[key_p[:2] + (-1,)]
        z = view.pair_z[k]
        A, B = u[p.sigma], u[p.vel]
        szb = sign * z

        ids_p, w_p = jnp.asarray(tp.ids), jnp.asarray(tp.weights, dtype=u.dtype)
        ids_m, w_m = jnp.asarray(tm.ids), jnp.asarray(tm.weights, dtype=u.dtype)
        w_l = _gather_interp(A, ids_p, w_p) + szb * _gather_interp(B, ids_p, w_p)
        w_r = _gather_interp(A, ids_m, w_m) - szb * _gather_interp(B, ids_m, w_m)

        # border: feet outside the hull are incoming invariants, overwritten
        # from the physical constraint using the node's outgoing invariant
        # (same characteristic algebra as solver.boundary, SURVEY.md §0.4)
        out_p = jnp.asarray(tp.outside)   # w_l incoming where its foot left
        out_m = jnp.asarray(tm.outside)   # w_r incoming where its foot left
        kind, val = _border_kind_value(border_kind, p, axis)
        w_l0, w_r0 = w_l, w_r
        if kind == "absorbing":
            w_l = jnp.where(out_p, 0.0, w_l)
            w_r = jnp.where(out_m, 0.0, w_r)
        elif kind == "free":
            w_l = jnp.where(out_p, -w_r0, w_l)
            w_r = jnp.where(out_m, -w_l0, w_r)
        elif kind == "fixed_force":
            w_l = jnp.where(out_p, 2.0 * val - w_r0, w_l)
            w_r = jnp.where(out_m, 2.0 * val - w_l0, w_r)
        elif kind == "fixed_velocity":
            w_l = jnp.where(out_p, w_r0 + 2.0 * sign * z * val, w_l)
            w_r = jnp.where(out_m, w_l0 - 2.0 * sign * z * val, w_r)
        else:  # pragma: no cover
            raise ValueError(kind)

        A_new = 0.5 * (w_l + w_r)
        B_prop = sign * (w_l - w_r) / (2.0 * jnp.maximum(z, _Z_EPS))
        B_new = jnp.where(z > 0, B_prop, B)
        comps[p.sigma] = A_new
        comps[p.vel] = B_new

    for j, zc in enumerate(st.zeros):
        if zc.src in comps:
            comps[zc.comp] = u[zc.comp] + view.zero_kappa[j] * (
                comps[zc.src] - u[zc.src])

    return jnp.stack([comps.get(i, u[i]) for i in range(model.ncomp)])


def simplex_step(
    model: Model,
    u: jnp.ndarray,
    mat: MaterialFields,
    tables: Dict[Tuple[int, str, int], FootTables],
    border_kind: str = "absorbing",
    axes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    if axes is None:
        axes = range(model.dim)
    for a in axes:
        u = simplex_stage(model, u, mat, tables, a, border_kind)
    return u
