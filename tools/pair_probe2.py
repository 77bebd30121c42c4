"""Pair-kernel A/B probe, round 2: tightly interleaved measurements.

pair_probe.py round 1 showed the tunnel window warming DURING the probe
(first anchor 3.01 ms, final re-anchor 2.684 ms), so single-vs-pair must
be interleaved to mean anything.  Also probes the big-tile pair configs
(now that the Mosaic scoped-vmem limit scales with the budget) and
borders-off variants to size the BC share of the VPU-bound compute.
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

    def make(name, body, nsteps, K=10):
        @jax.jit
        def scan_steps(u):
            return jax.lax.scan(lambda u, _: (body(u), None), u, None,
                                length=K, unroll=4)[0]

        return (name, scan_steps, nsteps * K)

    def single(bcs):
        def body(u):
            u = fused_step(model, u, mstack, dt, h, 2, bcs, PAIR[0])
            return fused_step(model, u, mstack, dt, h, 2, bcs, PAIR[1])
        return body

    def pair(bcs, bx, by, vb):
        def body(u):
            return fused_step(model, u, mstack, dt, h, 2, bcs,
                              axes_seq=PAIR, bx=bx, by=by,
                              vmem_budget=vb * 1024 * 1024)
        return body

    progs = [
        make("single", single(borders), 2),
        make("pair_32x64", pair(borders, 32, 64, 64), 2),
        make("pair_64x64", pair(borders, 64, 64, 160), 2),
        make("pair_32x128", pair(borders, 32, 128, 160), 2),
        make("single_nobc", single(None), 2),
        make("pair_nobc", pair(None, 32, 64, 64), 2),
    ]

    # compile everything first (amortized; cache warm from probe 1 for
    # the repeated configs)
    state = {}
    for name, fn, _ in progs:
        try:
            u = fn(u0)
            sync(u)
            state[name] = u
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "compile_error": str(e)[-160:]}),
                  flush=True)

    # interleaved timing, 3 rounds
    for rnd in range(3):
        for name, fn, nst in progs:
            if name not in state:
                continue
            u = state[name]
            t0 = time.perf_counter()
            u = fn(u)
            sync(u)
            dtw = (time.perf_counter() - t0) / nst
            state[name] = u
            print(json.dumps({"round": rnd, "name": name,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "points_per_s": round(npoints / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
