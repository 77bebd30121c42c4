"""Temporal-blocking probe: pair (K=2) and quad (K=4) fused kernels vs the
single-step anchor, back-to-back in ONE process / one tunnel window
(BASELINE.md measurement discipline).

The single-step fused kernel is measured at ~97-100% of the Pallas copy
ceiling (round-2 roofline study), so the only remaining single-chip lever
is fewer HBM passes: a K-step window (K*r halo) writes/reads the state
once per K steps (VERDICT r3 item 1).

Run on the real chip (no CPU pin), in the background:
  python tools/pair_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (256, 256, 128)


def main():
    import jax

    import __graft_entry__ as g
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.ops.pallas_fused import fused_step, stack_mats
    from gcm_tpu.task import BorderSpec

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
    PAIR = ((0, 1, 2), (2, 1, 0))

    def sync(x):
        v = float(np.asarray(x[0, 0, 0, 0]))
        assert np.isfinite(v)

    def time_scan(body, nsteps_per_call, K=10, unroll=4):
        @jax.jit
        def scan_steps(u):
            return jax.lax.scan(lambda u, _: (body(u), None), u, None,
                                length=K, unroll=unroll)[0]

        u = scan_steps(u0)
        sync(u)
        t0 = time.perf_counter()
        u = scan_steps(u)
        sync(u)
        t = (time.perf_counter() - t0) / (K * nsteps_per_call)
        return t

    results = []

    def report(name, t_step):
        rec = {"name": name, "ms_per_step": round(t_step * 1e3, 3),
               "points_per_s": round(npoints / t_step, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # anchor: single-step fused, tuned tiles (engine default)
    def single(u):
        u = fused_step(model, u, mstack, dt, h, 2, borders, PAIR[0])
        return fused_step(model, u, mstack, dt, h, 2, borders, PAIR[1])

    report("single_pairloop_bx32_by64", time_scan(single, 2))

    for (bx, by, budget) in [(32, 64, 64), (16, 64, 64), (32, 32, 64),
                             (64, 64, 128), (32, 128, 128)]:
        def pair(u, bx=bx, by=by, budget=budget):
            return fused_step(model, u, mstack, dt, h, 2, borders,
                              axes_seq=PAIR, bx=bx, by=by,
                              vmem_budget=budget * 1024 * 1024)

        try:
            report(f"pair_bx{bx}_by{by}_v{budget}", time_scan(pair, 2))
        except Exception as e:  # noqa: BLE001 — keep probing other configs
            print(json.dumps({"name": f"pair_bx{bx}_by{by}_v{budget}",
                              "error": str(e)[-200:]}), flush=True)

    # K=4: two symmetrized pairs per pass (halo 4)
    for (bx, by, budget) in [(32, 64, 96), (16, 64, 96)]:
        def quad(u, bx=bx, by=by, budget=budget):
            return fused_step(model, u, mstack, dt, h, 2, borders,
                              axes_seq=PAIR + PAIR, bx=bx, by=by,
                              vmem_budget=budget * 1024 * 1024)

        try:
            report(f"quad_bx{bx}_by{by}_v{budget}", time_scan(quad, 4, K=5))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": f"quad_bx{bx}_by{by}_v{budget}",
                              "error": str(e)[-200:]}), flush=True)

    # re-anchor at the end: detects tunnel-window degradation mid-probe
    report("single_pairloop_reanchor", time_scan(single, 2))
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
