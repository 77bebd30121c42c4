"""Interleaved A/B: S/D-regrouped pair interpolation vs the four-interp
form in the fused kernel (both traced in one process via the SD_INTERP
module flag — the only sound protocol, BASELINE.md round-4 notes)."""

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
    import gcm_tpu.ops.pallas_fused as pf
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.task import BorderSpec

    model = get_model("elastic3d")
    _, u0, mat = g._flagship(SHAPE)
    mstack = pf.stack_mats(model, mat, compact=True)
    h = (10.0, 10.0, 10.0)
    z = np.linspace(0.0, 1.0, SHAPE[2])[None, None, :]
    dt = 0.8 * min(h) / float((2100.0 + 3100.0 * z).max())
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(3) for s in (0, 1)}
    borders[(2, 0)] = BorderSpec("free")
    npoints = int(np.prod(SHAPE))

    def sync(x):
        v = float(np.asarray(x[0, 0, 0, 0]))
        assert np.isfinite(v)

    def make(flag):
        pf.SD_INTERP = flag

        @jax.jit
        def scan_steps(u):
            def pair(u):
                u = pf.fused_step(model, u, mstack, dt, h, 2, borders,
                                  (0, 1, 2))
                return pf.fused_step(model, u, mstack, dt, h, 2, borders,
                                     (2, 1, 0))
            return jax.lax.scan(lambda u, _: (pair(u), None), u, None,
                                length=10, unroll=4)[0]

        u = scan_steps(u0)   # trace+compile with the flag value
        sync(u)
        return scan_steps

    progs = [("sd", make(True)), ("interp4", make(False))]
    state = {n: u0 for n, _ in progs}
    for rnd in range(3):
        for name, fn in progs:
            u = fn(state[name])
            t0 = time.perf_counter()
            u = fn(u)
            sync(u)
            dtw = (time.perf_counter() - t0) / 20
            state[name] = u
            print(json.dumps({"round": rnd, "name": name,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "points_per_s": round(npoints / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
