"""Simplex-path TPU probe: where does the gather time actually go?

Round-3 found TPU gathers pay per INDEX, not per fetched byte (BASELINE.md
round-3 note).  This probe isolates the candidate levers for VERDICT r3
item 3 before committing to a redesign:

- comp-major [ncomp, N] state with a per-table transpose (current path);
- node-major [N, ncomp] state (no transposes: 12 fewer per step);
- one MERGED gather per stage (all 4 foot tables' indices concatenated);
- lane-padded node-major rows (fetch width is ~free if per-index cost
  dominates).

Run on the real chip, background: python tools/simplex_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gcm_tpu.engine_simplex import SimplexEngine
    from gcm_tpu.grids.simplex import SimplexGrid
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.simplex_gcm import simplex_stage

    rng = np.random.default_rng(0)
    n = 33
    grid = SimplexGrid.box((0, 0, 0), (1.0, 1.0, 1.0), (n, n, n),
                           jitter=0.15)
    mat = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)
    u0 = 0.01 * rng.standard_normal((9, grid.npoints)).astype(np.float32)
    eng = SimplexEngine(grid, "elastic3d", mat, cfl=0.8, u0=u0,
                        dtype=jnp.float32)
    N = grid.npoints
    model, tables = eng.model, eng.tables

    def sync(x):
        v = float(np.asarray(x.reshape(-1)[0]))
        assert np.isfinite(v)

    results = []

    def bench(name, fn, arg, iters, per_iter_items):
        jfn = jax.jit(fn)
        out = jfn(arg)
        sync(out)
        t0 = time.perf_counter()
        out = jfn(arg)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        rec = {"name": name, "ms": round(dt * 1e3, 3),
               "items_per_s": round(per_iter_items / dt, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- anchor: the current full step (scan over symmetrized pairs)
    def pair(u):
        for axis in (0, 1, 2):
            u = simplex_stage(model, u, eng.mat, tables, axis,
                              eng.border_kind)
        for axis in (2, 1, 0):
            u = simplex_stage(model, u, eng.mat, tables, axis,
                              eng.border_kind)
        return u

    K = 10

    def scan_pairs(u):
        return jax.lax.scan(lambda u, _: (pair(u), None), u, None,
                            length=K)[0]

    bench("full_step_current", scan_pairs, eng.u, 2 * K, N)

    # ---- gather micro-benches: one stage's worth of interpolation
    # (4 tables x [N, K] ids), repeated R times inside one jit
    axis = 0
    keys = [(axis, w, d) for w in ("p", "s") for d in (+1, -1)]
    ids4 = [jnp.asarray(tables[k].ids) for k in keys]
    wts4 = [jnp.asarray(tables[k].weights, dtype=jnp.float32)
            for k in keys]
    Kpts = int(ids4[0].shape[1])
    clists = {("p"): [0, 3, 6, 8], ("s"): [1, 2, 4, 5, 7]}
    comp_of = {k: clists[k[1]] for k in keys}
    nidx = sum(int(i.size) for i in ids4)
    R = 50

    u_cm = jnp.asarray(u0)                       # [9, N] comp-major
    u_nm = jnp.asarray(u0.T.copy())              # [N, 9] node-major

    def g_comp_major(u):
        acc = 0.0
        for ids, wts, cl in zip(ids4, wts4, [comp_of[k] for k in keys]):
            rows = jnp.take(u[jnp.asarray(cl)].T, ids, axis=0)
            acc = acc + (rows * wts[:, :, None]).sum(1).sum()
        return acc

    def rep(f):
        def body(u):
            acc = 0.0
            for _ in range(R):
                acc = acc + f(u)
            return acc
        return body

    bench("gather_comp_major_T", rep(g_comp_major), u_cm, R, nidx)

    def g_node_major(u):
        acc = 0.0
        for ids, wts in zip(ids4, wts4):
            rows = jnp.take(u, ids, axis=0)      # [N, K, 9]
            acc = acc + (rows * wts[:, :, None]).sum(1).sum()
        return acc

    bench("gather_node_major", rep(g_node_major), u_nm, R, nidx)

    ids_m = jnp.concatenate(ids4, 0)             # [4N, K]
    wts_m = jnp.concatenate(wts4, 0)

    def g_merged(u):
        rows = jnp.take(u, ids_m, axis=0)        # [4N, K, 9]
        return (rows * wts_m[:, :, None]).sum(1).sum()

    bench("gather_merged_node_major", rep(g_merged), u_nm, R, nidx)

    u_pad = jnp.pad(u_nm, ((0, 0), (0, 128 - 9)))

    def g_pad(u):
        rows = jnp.take(u, ids_m, axis=0)
        return (rows * wts_m[:, :, None]).sum(1).sum()

    bench("gather_merged_lane128", rep(g_pad), u_pad, R, nidx)

    # flat 1-D gather baseline (what round 2 ran per component)
    idsf = ids_m[:, 0].reshape(-1)

    def g_flat1(u):
        return jnp.take(u, idsf, axis=0).sum()

    bench("gather_rows_K1", rep(g_flat1), u_nm, R, idsf.size)

    print(json.dumps({"all": results, "npoints": N, "nidx_stage": nidx}))


if __name__ == "__main__":
    main()
