"""End-to-end seismic-survey demo: layered 3D earth, explosion shot,
surface receiver line — the BASELINE configs 3+4 workflow as a user would
run it.

    python examples/seismic_survey.py [--n 64] [--nsteps 160] [--cpu]

Writes VTK snapshots + a receiver gather (npz/bin) into ./survey_out and
prints direct P-wave arrival times at the receivers against the straight-ray
prediction — a physical sanity check you can eyeball.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--nsteps", type=int, default=160)
    ap.add_argument("--outdir", default="survey_out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from gcm_tpu.engine import Engine
    from gcm_tpu.scenarios import get_scenario
    from gcm_tpu.task import DetectorSpec, SnapshotSpec

    task = get_scenario("elastic3d_explosion", n=args.n, nsteps=args.nsteps)
    # receiver line on the free surface, offsets 0..800 m from the epicenter
    L = task.grid.lengths
    src_xy = (L[0] / 2, L[1] / 2)
    offsets = np.linspace(0.0, 800.0, 9)
    receivers = tuple((src_xy[0] + off, src_xy[1], 0.0) for off in offsets)
    task = dataclasses.replace(
        task,
        detectors=DetectorSpec(points=receivers),
        snapshots=SnapshotSpec(every=max(args.nsteps // 4, 1)),
    )

    eng = Engine(task)
    res = eng.run_with_outputs(args.outdir)
    print(f"ran {res.nsteps} steps, dt={res.dt:.5f}s, "
          f"{res.points_per_second:.3g} points/s")

    # direct P arrival: source at depth 400 m, sediment cp to the surface
    vz = res.traces[:, :, 2]                       # vertical velocity
    src = task.sources[0]
    t = (np.arange(res.nsteps) + 1) * res.dt
    cp_sed = 2100.0
    depth = src.position[2]
    print(f"{'offset[m]':>10} {'t_pred[s]':>10} {'t_first[s]':>10}")
    for k, off in enumerate(offsets):
        dist = np.hypot(off, depth)
        t_pred = dist / cp_sed + src.t0
        a = np.abs(vz[:, k])
        first = np.argmax(a > 0.25 * a.max())      # first break, not peak
        print(f"{off:10.0f} {t_pred:10.3f} {t[first]:10.3f}")
    print(f"artifacts in {args.outdir}/: snapshots/*.vti, "
          f"{task.name}.npz (gather)")


if __name__ == "__main__":
    main()
