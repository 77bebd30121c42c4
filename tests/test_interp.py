"""Unit tests for the semi-Lagrangian interpolation stencils (SURVEY.md §4).

Mirrors the reference's interpolator unit tests: weights sum to one, the
stencil is exact on polynomials up to its order, CFL=1 is an exact shift.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gcm_tpu.ops.interp import (
    interp_at_foot, shift, stencil_offsets, stencil_weights, stencil_radius,
)

ORDERS = [1, 2, 3, 4]


@pytest.mark.parametrize("order", ORDERS)
def test_weights_sum_to_one(order):
    nu = np.linspace(0.0, 1.0, 11)
    w = stencil_weights(order, nu)
    np.testing.assert_allclose(sum(np.asarray(x) for x in w), 1.0, atol=1e-12)


@pytest.mark.parametrize("order", ORDERS)
@pytest.mark.parametrize("direction", [-1, 1])
def test_exact_on_polynomials(order, direction):
    """Interpolating x^k for k <= order must be exact at the foot."""
    n = 32
    x = np.arange(n, dtype=np.float64)
    nu = 0.37
    offs = stencil_offsets(order, direction)
    wts = stencil_weights(order, nu)
    i0 = n // 2
    foot = i0 + direction * nu
    for k in range(order + 1):
        val = sum(w * (i0 + o) ** k for o, w in zip(offs, wts))
        assert abs(val - foot ** k) < 1e-9 * max(1.0, abs(foot) ** k)


@pytest.mark.parametrize("j", [-2, -1, 0, 1, 2])
def test_shift_edge_clamped(j):
    f = jnp.arange(10.0)
    g = np.asarray(shift(f, j, 0))
    expect = np.array([f[min(max(i + j, 0), 9)] for i in range(10)])
    np.testing.assert_array_equal(g, expect)


@pytest.mark.parametrize("order", ORDERS)
def test_interp_matches_direct_lagrange(order, rng):
    """Vectorized interp == per-node Lagrange evaluation (interior nodes)."""
    n = 24
    f = jnp.asarray(rng.standard_normal(n))
    nu_field = jnp.asarray(rng.uniform(0.0, 1.0, n))
    for d in (-1, 1):
        out = np.asarray(interp_at_foot(f, nu_field, d, order, 0))
        rad = stencil_radius(order)
        offs = stencil_offsets(order, d)
        for i in range(rad + 2, n - rad - 2):
            t = float(nu_field[i])
            pts = [d * r for r in ([0, 1] if order == 1 else
                                   [-1, 0, 1] if order == 2 else
                                   [-1, 0, 1, 2] if order == 3 else
                                   [-2, -1, 0, 1, 2])]
            val = 0.0
            for p in pts:
                lj = 1.0
                for q in pts:
                    if q != p:
                        lj *= (d * t - q) / (p - q)
                val += lj * float(f[i + p])
            assert abs(out[i] - val) < 1e-9


@pytest.mark.parametrize("order", ORDERS)
def test_cfl_one_exact_shift(order):
    """At nu == 1 the foot is exactly the neighbor node."""
    n = 16
    f = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    for d in (-1, 1):
        out = np.asarray(interp_at_foot(f, jnp.ones(n), d, order, 0))
        expect = np.asarray(shift(f, d, 0))
        np.testing.assert_allclose(out, expect, atol=1e-12)
