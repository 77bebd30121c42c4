"""Round-4 probe: simplex stencil-path scaling + folded correctors on-chip.

1. Simplex (compressed-stencil sweeps): n=33 anchor and n=65 — does the
   roll-based path amortize at production mesh sizes?
2. Fused 3D kernel with the Maxwell+damage epilogue at the flagship shape:
   does Mosaic compile the aux-block variant, and what is the folded
   viscoelastic rate vs the plain elastic anchor?
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync1(x):
    v = float(np.asarray(x.reshape(-1)[0]))
    assert np.isfinite(v)


def bench_simplex(n):
    import jax
    import jax.numpy as jnp

    from gcm_tpu.engine_simplex import SimplexEngine
    from gcm_tpu.grids.simplex import SimplexGrid
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.simplex_gcm import simplex_step

    rng = np.random.default_rng(0)
    grid = SimplexGrid.box((0, 0, 0), (1.0, 1.0, 1.0), (n, n, n),
                           jitter=0.15)
    mat = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    u0 = 0.01 * rng.standard_normal((9, grid.npoints)).astype(np.float32)
    eng = SimplexEngine(grid, "elastic3d", mat, cfl=0.8, u0=u0,
                        dtype=jnp.float32)
    ncomp = sum(1 for t in eng.tables.values() if t.stencil is not None)
    K = 10

    @jax.jit
    def scan_steps(u):
        def pair(u):
            u = simplex_step(eng.model, u, eng.mat, eng.tables,
                             eng.border_kind, (0, 1, 2))
            return simplex_step(eng.model, u, eng.mat, eng.tables,
                                eng.border_kind, (2, 1, 0))
        return jax.lax.scan(lambda u, _: (pair(u), None), u, None,
                            length=K)[0]

    u = scan_steps(eng.u)
    sync1(u)
    t0 = time.perf_counter()
    u = scan_steps(u)
    sync1(u)
    t = (time.perf_counter() - t0) / (2 * K)
    print(json.dumps({"name": f"simplex_n{n}", "npoints": grid.npoints,
                      "stencil_tables": ncomp,
                      "ms_per_step": round(t * 1e3, 3),
                      "points_per_s": round(grid.npoints / t, 1)}),
          flush=True)


def bench_folded():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.ops.pallas_fused import (
        fold_corrector_specs, fused_step, stack_mats)
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector
    from gcm_tpu.task import BorderSpec

    SHAPE = (256, 256, 128)
    model = get_model("elastic3d")
    fwd, u0, mat = g._flagship(SHAPE)
    mstack = stack_mats(model, mat, compact=True)
    h = (10.0, 10.0, 10.0)
    z = np.linspace(0.0, 1.0, SHAPE[2])[None, None, :]
    cp_max = float((2100.0 + 3100.0 * z).max())
    dt = 0.8 * min(h) / cp_max
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(3) for s in (0, 1)}
    borders[(2, 0)] = BorderSpec("free")
    npoints = int(np.prod(SHAPE))
    corr = (MaxwellCorrector(tau=50 * dt),
            DamageCorrector(threshold=5e5, rate=0.1 / dt))
    specs, naux = fold_corrector_specs(corr, dt)
    aux0 = jnp.zeros((1,) + SHAPE, jnp.float32)
    K = 10

    def run(name, body, carry):
        @jax.jit
        def scan_steps(c):
            return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                length=K, unroll=2)[0]

        c = scan_steps(carry)
        sync1(c[0] if isinstance(c, tuple) else c)
        t0 = time.perf_counter()
        c = scan_steps(c)
        sync1(c[0] if isinstance(c, tuple) else c)
        t = (time.perf_counter() - t0) / (2 * K)
        print(json.dumps({"name": name, "ms_per_step": round(t * 1e3, 3),
                          "points_per_s": round(npoints / t, 1)}),
              flush=True)

    def elastic(u):
        u = fused_step(model, u, mstack, dt, h, 2, borders, (0, 1, 2))
        return fused_step(model, u, mstack, dt, h, 2, borders, (2, 1, 0))

    run("elastic_anchor", elastic, u0)

    def folded(c):
        u, aux = c
        u, aux = fused_step(model, u, mstack, dt, h, 2, borders, (0, 1, 2),
                            correctors=specs, aux=aux)
        u, aux = fused_step(model, u, mstack, dt, h, 2, borders, (2, 1, 0),
                            correctors=specs, aux=aux)
        return (u, aux)

    try:
        run("folded_maxwell_damage", folded, (u0, aux0))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": "folded_maxwell_damage",
                          "error": str(e)[-300:]}), flush=True)

    # separate-pass comparison: kernel + jnp corrector passes
    def separate(c):
        u, aux = c
        for axes in ((0, 1, 2), (2, 1, 0)):
            u = fused_step(model, u, mstack, dt, h, 2, borders, axes)
            ad = {"damage": aux[0]}
            for co in corr:
                u, ad = co(model, u, ad, dt)
            aux = jnp.stack([ad["damage"]])
        return (u, aux)

    run("separate_pass_correctors", separate, (u0, aux0))
    run("elastic_reanchor", elastic, u0)


def main():
    bench_folded()
    bench_simplex(33)
    bench_simplex(65)


if __name__ == "__main__":
    main()
