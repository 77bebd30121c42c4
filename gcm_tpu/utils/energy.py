"""Elastic + kinetic energy diagnostics.

The standard integral observable of a velocity–stress elastodynamics run:
``E = sum_nodes (rho |v|^2 / 2 + W(sigma)) * cell_volume``. With absorbing
borders E must decay monotonically (outgoing characteristics leave,
nothing enters) — a physics invariant the tests pin; with free borders E
is conserved up to splitting error.

Isotropic strain energy density, d-dimensional (from inverting
``sigma = lam tr(eps) I + 2 mu eps``):

    W = (1/2) [ sigma:sigma / (2 mu)
                - lam (tr sigma)^2 / (2 mu (d lam + 2 mu)) ]

(1D check: W = sigma^2 / (2 (lam + 2 mu)); acoustic: W = p^2 / (2 lam).)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from gcm_tpu.models.spec import Model


def elastic_energy(
    model: Model,
    u: jnp.ndarray,
    rho: jnp.ndarray,
    lam: jnp.ndarray,
    mu: jnp.ndarray,
    h: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """Total energy of a state (scalar); node-summed, times cell volume.

    ``rho/lam/mu`` are per-node arrays. Acoustic models (state (v.., p),
    mu unused) use the bulk term p^2/(2 lam). ``h`` scales by the cell
    volume (omit for a pure node sum).
    """
    dim = model.dim
    names = model.comp_names
    kinetic = 0.5 * rho * sum(u[i] ** 2 for i in range(dim))

    if "p" in names:
        p = u[model.comp("p")]
        potential = 0.5 * p ** 2 / jnp.maximum(lam, 1e-300)
    else:
        ax = "xyz"[:dim]
        diag = [u[model.comp(f"s{a}{a}")] for a in ax]
        offd = [u[model.comp(f"s{ax[i]}{ax[j]}")]
                for i in range(dim) for j in range(i + 1, dim)]
        ss = sum(d ** 2 for d in diag) + 2.0 * sum(o ** 2 for o in offd)
        tr = sum(diag)
        mu_s = jnp.maximum(mu, 1e-300)
        potential = 0.5 * (ss / (2.0 * mu_s)
                           - lam * tr ** 2
                           / (2.0 * mu_s * (dim * lam + 2.0 * mu_s)))

    total = jnp.sum(kinetic + potential)
    if h is not None:
        vol = 1.0
        for hh in h:
            vol = vol * hh
        total = total * vol
    return total
