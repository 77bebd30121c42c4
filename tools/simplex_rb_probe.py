"""Block-size probe: RB=128 (current default) vs RB=256 (R rounded to a
256-multiple so the bigger block divides). Interleaved on the cached
65^3 setup."""

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
    from gcm_tpu.ops.pallas_simplex import fused_simplex_step

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
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(0.01 * rng.standard_normal((9, N)), jnp.float32)
    K = 10
    orig_layout = psx._pick_layout

    state = {}
    for mult in (64, 256):
        psx._pick_layout = (
            orig_layout if mult == 64 else
            (lambda NN, L=128: (-(-(-(-NN // L)) // 256) * 256, L)))
        plan = psx.build_fused_simplex_plan(model, mat, tables,
                                           "absorbing", dtype=jnp.float32)
        psx._pick_layout = orig_layout

        def pair(u3, _p=plan):
            u3 = fused_simplex_step(_p, u3, (0, 1, 2))
            return fused_simplex_step(_p, u3, (2, 1, 0))

        fn = jax.jit(lambda u3, _pair=pair: jax.lax.scan(
            lambda u, _: (_pair(u), None), u3, None, length=K)[0])
        u = fn(plan.pad(u0))
        float(np.asarray(u[0, 0, 0]))
        state[f"Rmult{mult}"] = (fn, u)
        print(json.dumps({"compiled": mult, "R": plan.R}), flush=True)

    for rnd in range(3):
        for name, (fn, u) in state.items():
            t0 = time.perf_counter()
            u = fn(u)
            float(np.asarray(u[0, 0, 0]))
            dtw = (time.perf_counter() - t0) / (2 * K)
            state[name] = (fn, u)
            print(json.dumps({"round": rnd, "name": name,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "points_per_s": round(N / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
