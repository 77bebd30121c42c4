"""Temporal order of the symmetrized dimensional splitting (SURVEY §0.3).

Round-1 verdict item 8: the second-order-in-time claim had only 1D
evidence. Design: 2D acoustic with uniform speed at CFL = 1 on both axes —
each 1D sweep is then an EXACT shift (order-1 interpolation is exact at
nu = 1), so the entire error of a run is the dimensional-splitting error.
Refining (h, dt) together at fixed final time isolates its order:
symmetrized (x,y / y,x alternation — Strang-equivalent over step pairs)
must converge at slope ~2, the plain fixed-order splitting at slope ~1.
"""

import jax.numpy as jnp
import numpy as np

from gcm_tpu.materials import IsotropicMaterial, MaterialFields
from gcm_tpu.models.spec import get_model
from gcm_tpu.solver.gcm import step
from gcm_tpu.task import BorderSpec

C0 = 1500.0
L = 64.0
T_STEPS_BASE = 8          # steps at the coarsest level (dt halves per level)


def _run(n: int, symmetrize: bool) -> np.ndarray:
    """n nodes per axis; h = L/(n-1); dt = h/c (CFL=1); T fixed."""
    model = get_model("acoustic2d")
    shape = (n, n)
    h = L / (n - 1)
    dt = h / C0
    level = round(np.log2((n - 1) / 32))
    nsteps = T_STEPS_BASE * (2 ** level)

    mat = MaterialFields.uniform(
        IsotropicMaterial.from_speeds(1000.0, C0), shape,
        xp=jnp, dtype=jnp.float64)
    x = np.linspace(0, L, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    # asymmetric data: an x<->y symmetric blob cancels the leading Lie
    # splitting error term and both variants then measure ~2 — the plain
    # variant's first-order character only shows on generic data
    g1 = np.exp(-(((X - 26.0) ** 2 + (Y - 34.0) ** 2) / (2 * 4.0 ** 2)))
    g2 = np.exp(-(((X - 38.0) ** 2 + (Y - 30.0) ** 2) / (2 * 6.0 ** 2)))
    u = jnp.asarray(np.stack([0.3 * g2, -0.2 * g1, 1e5 * g1]),
                    dtype=jnp.float64)
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(2) for s in (0, 1)}
    for k in range(nsteps):
        axes = (0, 1)
        if symmetrize and k % 2 == 1:
            axes = (1, 0)
        u = step(model, u, mat, dt, (h, h), 1, borders, axes)
    return np.asarray(u)


def _errors(symmetrize: bool):
    ns = [33, 65, 129, 257]
    runs = [_run(n, symmetrize) for n in ns]
    ref = runs[-1]
    errs = []
    for n, u in zip(ns[:-1], runs[:-1]):
        stride = (ns[-1] - 1) // (n - 1)
        e = np.abs(u - ref[:, ::stride, ::stride]).max() / np.abs(ref).max()
        errs.append(e)
    return errs


def test_symmetrized_splitting_is_second_order_2d():
    errs = _errors(symmetrize=True)
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert min(orders) > 1.8, orders


def test_plain_splitting_is_only_first_order_2d():
    """The un-symmetrized (fixed-axis-order) variant degrades toward slope
    1 and its errors are several times the symmetrized ones level-for-level
    — the measured reason Task.symmetrize_stages defaults on."""
    e_plain = _errors(symmetrize=False)
    e_sym = _errors(symmetrize=True)
    orders = [np.log2(e_plain[i] / e_plain[i + 1])
              for i in range(len(e_plain) - 1)]
    assert orders[0] < 1.6, orders
    for ep, es in zip(e_plain, e_sym):
        assert ep > 2.5 * es, (e_plain, e_sym)
