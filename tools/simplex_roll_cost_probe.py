"""Where does the fused simplex sweep's time go? Roll-cost isolation.

Perf-only experiment: variant "noroll" monkeypatches pltpu.roll to the
identity INSIDE the kernel build — physically wrong results, identical op
structure otherwise — so (fused - noroll) is the pure lane-rotate cost.
Variant "nowhere" additionally drops the two-row select.  Interleaved
with the real kernel on the cached 65^3 setup.

Usage: python tools/simplex_roll_cost_probe.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    import jax
    import jax.numpy as jnp

    import gcm_tpu.ops.pallas_simplex as psx
    from gcm_tpu.engine_simplex import _material_fields
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.ops.pallas_simplex import (
        build_fused_simplex_plan, fused_simplex_step)

    from simplex_setup_cache import load

    rec = load(n)
    if rec is None:
        print(json.dumps({"error": "run simplex_fused_probe (or bench.py) "
                                   "first to build the setup cache"}))
        return
    grid, tables, dt = rec
    N = grid.npoints
    model = get_model("elastic3d")
    mat = _material_fields(
        IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0),
        N, jnp.float32)
    plan = build_fused_simplex_plan(model, mat, tables, "absorbing",
                                    dtype=jnp.float32)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(0.01 * rng.standard_normal((9, N)), jnp.float32)
    K = 10

    real_roll = psx.pltpu.roll

    def make_scan(tag):
        if tag == "noroll":
            psx.pltpu.roll = lambda x, *a, **k: x
        else:
            psx.pltpu.roll = real_roll

        def pair(u3):
            u3 = fused_simplex_step(plan, u3, (0, 1, 2))
            return fused_simplex_step(plan, u3, (2, 1, 0))

        fn = jax.jit(lambda u3: jax.lax.scan(
            lambda u, _: (pair(u), None), u3, None, length=K)[0])
        u = fn(plan.pad(u0))
        float(np.asarray(u[0, 0, 0]))
        psx.pltpu.roll = real_roll
        return fn, u

    state = {}
    for tag in ("real", "noroll"):
        fn, u = make_scan(tag)
        state[tag] = (fn, u)
        print(json.dumps({"compiled": tag}), flush=True)

    for rnd in range(3):
        for tag, (fn, u) in state.items():
            t0 = time.perf_counter()
            u = fn(u)
            float(np.asarray(u[0, 0, 0]))
            dtw = (time.perf_counter() - t0) / (2 * K)
            state[tag] = (fn, u)
            print(json.dumps({"round": rnd, "name": tag,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "points_per_s": round(N / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
