"""Benchmark of record: grid-points/s for the 3D heterogeneous elastic step.

BASELINE.json metric: "grid-points/s/chip (3D elastic GCM step)". The
reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports the
speedup of the best compute path over this framework's own straightforward
jnp formulation (the "unfused baseline implementation") on the same chip —
the honest, measurable proxy until a reference binary exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _build(shape, dtype_name="float32"):
    import jax.numpy as jnp

    import __graft_entry__ as g

    fwd, u0, mat = g._flagship(shape, dtype=getattr(jnp, dtype_name))
    return fwd, u0, mat


def _sync(x):
    """Force completion: a scalar device->host fetch (block_until_ready has
    been observed not to block on the experimental axon platform)."""
    v = float(np.asarray(x[0, 0, 0, 0]))
    assert np.isfinite(v), "non-finite state"
    return v


def _time_steps(fn, u, mat, nwarm=5, niter=25):
    """Per-step wall time via interval differencing with forced syncs."""
    stepped = u
    for _ in range(nwarm):
        stepped = fn(stepped, mat)
    _sync(stepped)
    t0 = time.perf_counter()
    for _ in range(niter):
        stepped = fn(stepped, mat)
    _sync(stepped)
    return (time.perf_counter() - t0) / niter


def main():
    import jax

    shape = (256, 256, 128)
    npoints = int(np.prod(shape))
    fwd, u0, mat = _build(shape)

    jit_fwd = jax.jit(fwd, donate_argnums=0)
    t_jnp = _time_steps(jit_fwd, u0, mat)
    jnp_pps = npoints / t_jnp

    best_pps, best_name = jnp_pps, "jnp"
    try:
        import __graft_entry__ as g

        pfwd = g._flagship_pallas(shape)
        jit_p = jax.jit(pfwd, donate_argnums=0)
        _, u1, mat1 = _build(shape)  # fresh state (previous was donated)
        t_pal = _time_steps(jit_p, u1, mat1)
        pal_pps = npoints / t_pal
        if pal_pps > best_pps:
            best_pps, best_name = pal_pps, "pallas"
    except Exception as e:  # pallas path must never break the benchmark
        print(f"# pallas path failed: {type(e).__name__}: {e}", flush=True)

    print(json.dumps({
        "metric": "grid-points/s/chip (3D elastic GCM step)",
        "value": round(best_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(best_pps / jnp_pps, 3),
        "path": best_name,
        "jnp_points_per_s": round(jnp_pps, 1),
        "shape": list(shape),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
