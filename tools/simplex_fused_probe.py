"""Fused simplex kernel vs the jnp roll-stencil path: interleaved A/B.

VERDICT r4 next #1: the compressed-stencil sweep as |D| XLA rolls vs ONE
Pallas VMEM pass per stage.  Builds the bench mesh (jittered box lattice,
order 1), compiles both step pairs, checks on-chip parity, then times in
interleaved rounds (the tunnel window warms during a probe — sequential
A-then-B numbers are garbage; BASELINE.md measurement protocol).

Usage: python tools/simplex_fused_probe.py [n]  (default 33)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    import jax
    import jax.numpy as jnp

    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.ops.pallas_simplex import (
        build_fused_simplex_plan, fused_simplex_step)
    from gcm_tpu.solver.simplex_gcm import simplex_stage

    t0 = time.time()
    rng = np.random.default_rng(0)
    mat = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    # the 65^3 table build costs ~14 min host-side; /tmp-cached (format
    # owned by simplex_setup_cache.py, shared with bench.py)
    from simplex_setup_cache import engine_from_parts, load_or_build

    grid, tables, dt = load_or_build(n, mat)
    u0 = 0.01 * rng.standard_normal((9, grid.npoints)).astype(np.float32)
    eng = engine_from_parts(mat, grid, tables, dt, u0)
    print(json.dumps({"setup_s": round(time.time() - t0, 1),
                      "npoints": int(grid.npoints),
                      "compressed": all(eng.stencil_compressed.values())}),
          flush=True)
    plan = build_fused_simplex_plan(eng.model, eng.mat, eng.tables,
                                    eng.border_kind, dtype=jnp.float32)
    assert plan is not None, "plan must build for the bench mesh"
    stage_info = {a: {"halo": s.halo, "ndA": int(s.W.shape[0])}
                  for a, s in plan.stages.items()}
    print(json.dumps({"R": plan.R, "L": plan.L, "stages": stage_info}),
          flush=True)

    K = 10
    npts = int(grid.npoints)

    def jnp_pair(u):
        for axis in (0, 1, 2):
            u = simplex_stage(eng.model, u, eng.mat, eng.tables, axis,
                              eng.border_kind)
        for axis in (2, 1, 0):
            u = simplex_stage(eng.model, u, eng.mat, eng.tables, axis,
                              eng.border_kind)
        return u

    def fused_pair(u3):
        u3 = fused_simplex_step(plan, u3, (0, 1, 2))
        return fused_simplex_step(plan, u3, (2, 1, 0))

    @jax.jit
    def scan_jnp(u):
        return jax.lax.scan(lambda u, _: (jnp_pair(u), None), u, None,
                            length=K)[0]

    @jax.jit
    def scan_fused(u3):
        return jax.lax.scan(lambda u, _: (fused_pair(u), None), u3, None,
                            length=K)[0]

    def sync2(x):
        v = float(np.asarray(x[0, 0]))
        assert np.isfinite(v)

    def sync3(x):
        v = float(np.asarray(x[0, 0, 0]))
        assert np.isfinite(v)

    # parity: one pair, fused vs jnp, on the same backend
    u_j = jax.jit(jnp_pair)(jnp.asarray(u0))
    sync2(u_j)
    u_f3 = jax.jit(fused_pair)(plan.pad(jnp.asarray(u0)))
    sync3(u_f3)
    u_f = np.asarray(plan.unpad(u_f3))
    w = np.asarray(u_j)
    scale = np.abs(w).reshape(9, -1).max(1) + 1e-30
    err = np.abs(u_f - w).reshape(9, -1).max(1) / scale
    print(json.dumps({"parity_max_rel_err": float(err.max())}), flush=True)
    assert err.max() < 5e-5, err

    # compile the scans
    state = {"jnp": scan_jnp(jnp.asarray(u0)),
             "fused": scan_fused(plan.pad(jnp.asarray(u0)))}
    sync2(state["jnp"])
    sync3(state["fused"])

    for rnd in range(3):
        for name in ("jnp", "fused"):
            t1 = time.perf_counter()
            state[name] = (scan_jnp if name == "jnp"
                           else scan_fused)(state[name])
            (sync2 if name == "jnp" else sync3)(state[name])
            dtw = (time.perf_counter() - t1) / (2 * K)
            print(json.dumps({"round": rnd, "name": name,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "points_per_s": round(npts / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
