"""Production-path tax probe (VERDICT r2 item 2 / weak #1).

Times, on one real TPU chip, the flagship 3D heterogeneous elastic step:

  raw        — single-chip fused kernel, scan-timed (the kernel ceiling)
  spmd1      — make_fused_spmd_step on a 1-device mesh (production path;
               now dispatches to the raw kernel)
  ring       — the interior/ring shard_map machinery forced on the
               1-device mesh (force_spmd=True): the honest upper bound of
               what the N>1 production path costs per chip
  ring_small — same with the old 16x32 default tiles (the round-2 anchor)

All runs use the engine's production pattern: lax.scan over steps with
alternating (symmetrized) axes orders. One process, sequential, SIGALRM
budget per phase (never kill a TPU process externally).

Usage: python tools/tax_probe.py [--shape 256,256,128] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Budget:
    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._raise)
        signal.alarm(self.seconds)

    def _raise(self, *a):
        raise TimeoutError("phase budget exceeded")

    def __exit__(self, *a):
        signal.alarm(0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="256,256,128")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--budget", type=int, default=900)
    ap.add_argument("--phases", default="raw,spmd1,ring,ring_small")
    args = ap.parse_args()
    shape = tuple(int(x) for x in args.shape.split(","))
    K = args.steps

    import jax
    import jax.numpy as jnp

    from gcm_tpu.materials import MaterialFields
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.ops.pallas_fused import fused_step, stack_mats
    from gcm_tpu.parallel.fused_spmd import (
        extended_mstack, make_fused_spmd_step)
    from gcm_tpu.parallel.sharding import domain_mesh
    from gcm_tpu.task import BorderSpec

    model = get_model("elastic3d")
    rng = np.random.default_rng(0)
    z = np.linspace(0.0, 1.0, shape[2])[None, None, :]
    rho = (1900.0 + 800.0 * z) * np.ones(shape)
    cp = 2100.0 + 3100.0 * z * np.ones(shape)
    cs = 900.0 + 2100.0 * z * np.ones(shape)
    mu = rho * cs**2
    lam = rho * cp**2 - 2 * mu
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    h = (10.0, 10.0, 10.0)
    dt = 0.8 * min(h) / float(np.sqrt((lam + 2 * mu) / rho).max())
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(3) for s in (0, 1)}
    borders[(2, 0)] = BorderSpec("free")
    u0 = jnp.asarray(0.01 * rng.standard_normal((model.ncomp,) + shape),
                     dtype=jnp.float32)
    npoints = int(np.prod(shape))

    def sync(x):
        v = float(np.asarray(x[0, 0, 0, 0]))
        assert np.isfinite(v), "non-finite state"

    def scan_time(step2):
        """Time K alternating-axes steps under one jitted scan."""

        @jax.jit
        def scan_steps(u):
            def body(u, _):
                u = step2(u, (0, 1, 2))
                u = step2(u, (2, 1, 0))
                return u, None

            return jax.lax.scan(body, u, None, length=K // 2, unroll=2)[0]

        u = scan_steps(u0)
        sync(u)
        t0 = time.perf_counter()
        u = scan_steps(u)
        sync(u)
        return (time.perf_counter() - t0) / (2 * (K // 2))

    results = {}
    phases = args.phases.split(",")

    if "raw" in phases:
        mstack = stack_mats(model, mat, compact=True)
        with Budget(args.budget):
            t = scan_time(lambda u, axes: fused_step(
                model, u, mstack, dt, h, 2, borders, axes))
        results["raw"] = t

    if "raw_bf16" in phases:
        # bf16 material stack (VERDICT r2 item 8): half the static-material
        # DMA stream, f32 sweep arithmetic
        mstack16 = stack_mats(model, mat, compact=True).astype(jnp.bfloat16)
        with Budget(args.budget):
            t = scan_time(lambda u, axes: fused_step(
                model, u, mstack16, dt, h, 2, borders, axes))
        results["raw_bf16"] = t

    mesh1 = domain_mesh(3, devices=jax.devices()[:1])

    if "spmd1" in phases:
        mext = extended_mstack(model, mat, mesh1, 2)
        step = make_fused_spmd_step(model, mesh1, dt, h, 2, borders)
        # the scan carry stays UNSHARDED (engines do the same on 1-device
        # meshes: a NamedSharding carry runs ~23x slower on this platform)
        with Budget(args.budget):
            t = scan_time(lambda u, axes: step(u, mext, axes))
        results["spmd1"] = t

    if "ring" in phases:
        mext = extended_mstack(model, mat, mesh1, 2)
        step = make_fused_spmd_step(model, mesh1, dt, h, 2, borders,
                                    force_spmd=True)
        with Budget(args.budget):
            t = scan_time(lambda u, axes: step(u, mext, axes))
        results["ring"] = t

    if "ring_small" in phases:
        mext = extended_mstack(model, mat, mesh1, 2)
        step = make_fused_spmd_step(model, mesh1, dt, h, 2, borders,
                                    bx=16, by=32, force_spmd=True)
        with Budget(args.budget):
            t = scan_time(lambda u, axes: step(u, mext, axes))
        results["ring_small"] = t

    out = {k: {"ms_per_step": round(v * 1e3, 3),
               "points_per_s": round(npoints / v, 1)}
           for k, v in results.items()}
    if "raw" in out:
        for k in out:
            out[k]["vs_raw"] = round(
                (npoints / results[k]) / (npoints / results["raw"]), 3)
    print(json.dumps({"shape": list(shape), "steps": K, **out}))


if __name__ == "__main__":
    main()
