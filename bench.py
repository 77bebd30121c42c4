"""Benchmark of record: grid-points/s for the 3D heterogeneous elastic step.

BASELINE.json metric: "grid-points/s/chip (3D elastic GCM step)". The
reference publishes no numbers (BASELINE.md), so ``vs_baseline`` reports the
speedup of the best compute path over this framework's own straightforward
jnp formulation (the "unfused baseline implementation") on the same chip —
the honest, measurable proxy until a reference binary exists.

Each compute path runs in its own subprocess: the axon TPU tunnel admits
one client per process, block_until_ready has been observed not to block on
it (so timing uses forced scalar fetches), and a hung Mosaic remote-compile
must not wedge the whole benchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

SHAPE = (256, 256, 128)
PATH_TIMEOUT_S = 1200
#: the simplex worker pays ~18 min of host-side table builds (33^3 +
#: 65^3 Delaunay + locate) before any timing; builds are /tmp-cached so
#: a retry is fast, but the first run needs the longer budget
PATH_TIMEOUTS = {"simplex": 2700, "simplex_contact": 2400}
# the /tmp simplex setup-cache format is owned by
# tools/simplex_setup_cache.py (shared with every tools/simplex_*_probe)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))


def _sync(x):
    """Force completion via a scalar device->host fetch."""
    v = float(np.asarray(x[0, 0, 0, 0]))
    assert np.isfinite(v), "non-finite state"
    return v


def _time_steps(fn, u, mat, nwarm=5, niter=25):
    stepped = u
    for _ in range(nwarm):
        stepped = fn(stepped, mat)
    _sync(stepped)
    t0 = time.perf_counter()
    for _ in range(niter):
        stepped = fn(stepped, mat)
    _sync(stepped)
    return (time.perf_counter() - t0) / niter


def _repeat_timed(run_once, reps: int = 3):
    """Run a pre-compiled timing closure ``reps`` times and report the
    MEDIAN per-step time plus the relative spread (max-min)/median.

    The axon tunnel window warms/cools on minute scales (BASELINE.md
    measurement-protocol notes: identical programs varied 3.42->3.14e9
    across rounds), so a single sample makes BENCH_rNN incomparable
    across rounds — the median of 3 samples spaced across the window is
    the round-over-round-stable headline (VERDICT r4 weak #6)."""
    ts = [run_once() for _ in range(reps)]
    med = float(np.median(ts))
    return med, round((max(ts) - min(ts)) / max(med, 1e-12), 4)


def run_worker(path: str, shape) -> None:
    import jax

    import __graft_entry__ as g

    if path == "simplex":
        return _run_simplex_worker()
    if path == "simplex_contact":
        return _run_simplex_contact_worker()
    if path == "contact":
        return _run_contact_worker()
    if path == "visco":
        return _run_visco_worker()
    fwd, u0, mat = g._flagship(shape)
    if path == "pallas":
        fwd = g._flagship_pallas(shape)
    elif path == "fused":
        ffwd, prepare = g._flagship_fused(shape)
        mstack = prepare(mat)
        fwd = lambda u, _mat: ffwd(u, mstack)
    # Production timing: the engine runs steps under lax.scan, so the
    # benchmark does too — this also amortizes per-dispatch tunnel overhead.
    # ``unroll=4`` amortizes the per-loop-iteration latency of the axon
    # platform (~1 ms/iter measured) the same way the engine's scan_unroll
    # knob does in production runs.
    # NOTE: no donate_argnums — buffer donation has been observed to wedge
    # device->host fetches on the experimental axon platform.
    K = 20

    @jax.jit
    def scan_steps(u):
        return jax.lax.scan(lambda u, _: (fwd(u, mat), None), u, None,
                            length=K, unroll=4)[0]

    u = scan_steps(u0)          # compile + warm
    _sync(u)
    state = {"u": u}

    def once():
        t0 = time.perf_counter()
        state["u"] = scan_steps(state["u"])
        _sync(state["u"])
        return (time.perf_counter() - t0) / K

    t_step, spread = _repeat_timed(once)
    print(json.dumps({"path": path, "t_step": t_step, "spread": spread}))


def _run_simplex_worker() -> None:
    """Unstructured-path throughput (BASELINE config 5): one 3D elastic
    step over a jittered tet lattice, scan-timed like the structured
    paths. Since round 5 the production path is the FUSED Pallas sweep
    (ops.pallas_simplex — one VMEM pass per stage instead of |D| XLA
    rolls); both it and the jnp roll path are timed INTERLEAVED in this
    one process and the faster is reported (extras carry both)."""
    import jax
    import jax.numpy as jnp

    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.ops.pallas_simplex import (
        build_fused_simplex_plan, fused_simplex_step)
    from gcm_tpu.solver.simplex_gcm import simplex_stage

    rng = np.random.default_rng(0)

    def measure(n):
        from simplex_setup_cache import engine_from_parts, load_or_build

        mat = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0,
                                            cs=2300.0)
        # host-side setup cache (mesh + foot tables; ~14 min at 65^3):
        # format owned by tools/simplex_setup_cache.py, keyed by n
        grid, tables, dt_c = load_or_build(n, mat)
        u0 = 0.01 * rng.standard_normal(
            (9, grid.npoints)).astype(np.float32)
        eng = engine_from_parts(mat, grid, tables, dt_c, u0)
        plan = build_fused_simplex_plan(eng.model, eng.mat, eng.tables,
                                        eng.border_kind,
                                        dtype=jnp.float32)

        def pair(u):
            # one symmetrized step pair — the engine's production pattern
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

        K = 10      # pairs -> 2K steps

        @jax.jit
        def scan_jnp(u):
            return jax.lax.scan(lambda u, _: (pair(u), None), u, None,
                                length=K)[0]

        @jax.jit
        def scan_fused(u3):
            return jax.lax.scan(lambda u, _: (fused_pair(u), None), u3,
                                None, length=K)[0]

        state = {"jnp": scan_jnp(eng.u)}
        float(np.asarray(state["jnp"][0, 0]))
        if plan is not None:
            state["fused"] = scan_fused(plan.pad(eng.u))
            float(np.asarray(state["fused"][0, 0, 0]))

        def once(name):
            t0 = time.perf_counter()
            state[name] = (scan_jnp if name == "jnp"
                           else scan_fused)(state[name])
            idx = (0, 0) if name == "jnp" else (0, 0, 0)
            float(np.asarray(state[name][idx]))
            return (time.perf_counter() - t0) / (2 * K)

        # interleaved rounds: the tunnel window warms DURING a probe
        ts = {name: [] for name in state}
        for _ in range(3):
            for name in state:
                ts[name].append(once(name))
        med = {name: float(np.median(v)) for name, v in ts.items()}
        best = min(med, key=med.get)
        return med[best], int(grid.npoints), best, med.get("jnp")

    # n=33: the round-1..3 continuity mesh (per-op-overhead-bound);
    # n=65: production-size mesh where the stencil path amortizes
    t_step, npts, path33, t33_jnp = measure(33)
    t65, npts65, path65, t65_jnp = measure(65)
    print(json.dumps({"path": "simplex", "t_step": t_step,
                      "npoints": npts, "simplex_path": path33,
                      "t_step_n65": t65, "npoints_n65": npts65,
                      "simplex_path_n65": path65,
                      "t_step_jnp": t33_jnp, "t_step_n65_jnp": t65_jnp}))


def _run_simplex_contact_worker() -> None:
    """Two simplex bodies bonded across x with tensile fracture (the
    unstructured config-4 analogue), on SimplexMultiEngine's fused
    compressed-stencil sweeps + post-fixup contacts vs the jnp sweeps —
    interleaved in one process (VERDICT r4 next #8's bench row)."""
    import hashlib
    import pickle

    import jax
    import jax.numpy as jnp

    import gcm_tpu.engine_simplex as es
    from gcm_tpu.engine_simplex import SimplexBody, SimplexMultiEngine
    from gcm_tpu.grids.simplex import SimplexGrid
    from gcm_tpu.materials import IsotropicMaterial
    from gcm_tpu.solver.simplex_contact import SimplexContactSpec

    # /tmp-cache the foot-table builds (the dominant setup cost), keyed
    # by the mesh geometry+dt so both engine constructions reuse them
    real_ft = es._foot_tables

    def cached_ft(grid, model, mat, dt, order=1):
        key = hashlib.md5(
            grid.points.tobytes()
            + np.float64(dt).tobytes() + bytes([order])).hexdigest()[:16]
        path = f"/tmp/simplex_ct_tables_{key}.pkl"
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        tabs = real_ft(grid, model, mat, dt, order=order)
        with open(path, "wb") as f:
            pickle.dump(tabs, f)
        return tabs

    es._foot_tables = cached_ft

    n, half = 49, 25
    xk = 0.5
    rng = np.random.default_rng(0)
    g_a = SimplexGrid.box((0, 0, 0), (xk, 1, 1), (half, n, n),
                          jitter=0.12)
    g_b = SimplexGrid.box((xk, 0, 0), (1.0, 1, 1), (n - half + 1, n, n),
                          jitter=0.12)
    rock = IsotropicMaterial.from_speeds(rho=2500.0, cp=4000.0, cs=2300.0)

    def u0_of(g):
        u = np.zeros((9, g.npoints), np.float32)
        u[3:] = 1e5 * rng.standard_normal((6, g.npoints)).astype(
            np.float32)
        return u

    bodies = {"a": SimplexBody(g_a, rock, u0=u0_of(g_a)),
              "b": SimplexBody(g_b, rock, u0=u0_of(g_b))}
    contacts = [SimplexContactSpec("a", "b", axis=0, kind="bonded",
                                   tensile_strength=5e5)]
    engines = {
        "jnp": SimplexMultiEngine(bodies, contacts, "elastic3d", cfl=0.8,
                                  dtype=jnp.float32, kernel="jnp"),
        "fused": SimplexMultiEngine(bodies, contacts, "elastic3d",
                                    cfl=0.8, dtype=jnp.float32,
                                    kernel="pallas_simplex"),
    }
    npts = g_a.npoints + g_b.npoints
    K = 10
    amp = jnp.zeros((0,), jnp.float32)
    state = {}
    for name, eng in engines.items():
        @jax.jit
        def scan_pairs(carry, _eng=eng):
            def body(c, _):
                us, bonded, auxs = c
                us, bonded, auxs = _eng._one_step(us, bonded, auxs, amp, 0)
                us, bonded, auxs = _eng._one_step(us, bonded, auxs, amp, 1)
                return (us, bonded, auxs), None

            return jax.lax.scan(body, carry, None, length=K)[0]

        carry = scan_pairs((eng._pad_us(eng.us), eng.bonded, eng.auxs))
        v = float(np.asarray(carry[0]["a"][0, 0]))
        assert np.isfinite(v)
        state[name] = (scan_pairs, carry)

    ts = {name: [] for name in state}
    for _ in range(3):
        for name, (fn, carry) in state.items():
            t0 = time.perf_counter()
            carry = fn(carry)
            float(np.asarray(carry[0]["a"][0, 0]))
            ts[name].append((time.perf_counter() - t0) / (2 * K))
            state[name] = (fn, carry)
    med = {name: float(np.median(v)) for name, v in ts.items()}
    best = min(med, key=med.get)
    print(json.dumps({"path": "simplex_contact", "t_step": med[best],
                      "npoints": npts, "simplex_contact_path": best,
                      "t_step_jnp": med.get("jnp")}))


def _run_contact_worker() -> None:
    """Multi-body contact/fracture throughput (BASELINE config 4) on the
    fused full-step composition (VERDICT r3 item 2): each body one HBM
    pass + face-slab contact fixups. Reports AGGREGATE grid-points/s over
    both bodies."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gcm_tpu.engine_multi import MultiBodyEngine
    from gcm_tpu.scenarios import elastic3d_contact

    bodies, contacts = elastic3d_contact(n=256, nsteps=40)
    bodies = {k: dataclasses.replace(t, kernel="pallas_fused")
              for k, t in bodies.items()}
    # canonical_layout: z-interface moved off the lane axis — face-slab
    # fixups stop paying full-field traffic (BASELINE.md round-4 study)
    eng = MultiBodyEngine(bodies, contacts, canonical_layout=True)
    path_used = (
        "fused_canonical" if eng._perm is not None else
        "fused" if eng._fused_multi is not None else
        "pallas" if eng._raw_stage is not None else "jnp")
    nsrc = len(eng._srcs)
    amp = jnp.full((nsrc,), 1e3, jnp.float32)
    K = 10

    # Materials thread through jit as ARGS (engine._step_params): with
    # closure-captured stacks this program serialized at ~270 MB and
    # tripped the axon remote-compile proxy's HTTP body cap; as args it
    # is ~0.5 MB.
    params = eng._step_params()

    @jax.jit
    def scan_pairs(carry, params):
        def body(c, _):
            us, bonded, auxs = c
            us, bonded, auxs = eng._one_step(us, bonded, auxs, amp, 0,
                                             params)
            us, bonded, auxs = eng._one_step(us, bonded, auxs, amp, 1,
                                             params)
            return (us, bonded, auxs), None

        return jax.lax.scan(body, carry, None, length=K)[0]

    carry = scan_pairs((eng.us, eng.bonded, eng.auxs), params)
    v = float(np.asarray(carry[0]["upper"][0, 0, 0, 0]))
    assert np.isfinite(v)
    state = {"c": carry}

    def once():
        t0 = time.perf_counter()
        state["c"] = scan_pairs(state["c"], params)
        float(np.asarray(state["c"][0]["upper"][0, 0, 0, 0]))
        return (time.perf_counter() - t0) / (2 * K)

    t_step, spread = _repeat_timed(once)
    npts = sum(int(np.prod(t.grid.shape)) for t in eng.tasks.values())
    print(json.dumps({"path": "contact", "t_step": t_step,
                      "spread": spread,
                      "npoints": npts, "multi_path": path_used}))


def _run_visco_worker() -> None:
    """Viscoelastic+damage throughput with correctors folded into the
    fused kernel's epilogue (VERDICT r3 item 8) at the flagship shape."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.ops.pallas_fused import (
        fold_corrector_specs, fused_step, stack_mats)
    from gcm_tpu.solver.correctors import DamageCorrector, MaxwellCorrector
    from gcm_tpu.task import BorderSpec

    shape = SHAPE
    model = get_model("elastic3d")
    _, u0, mat = g._flagship(shape)
    mstack = stack_mats(model, mat, compact=True)
    h = (10.0, 10.0, 10.0)
    z = np.linspace(0.0, 1.0, shape[2])[None, None, :]
    dt = 0.8 * min(h) / float((2100.0 + 3100.0 * z).max())
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(3) for s in (0, 1)}
    borders[(2, 0)] = BorderSpec("free")
    corr = (MaxwellCorrector(tau=50 * dt),
            DamageCorrector(threshold=5e5, rate=0.1 / dt))
    specs, _ = fold_corrector_specs(corr, dt)
    aux0 = jnp.zeros((1,) + shape, jnp.float32)
    K = 10

    @jax.jit
    def scan_steps(carry):
        def body(c, _):
            u, aux = c
            for axes in ((0, 1, 2), (2, 1, 0)):
                u, aux = fused_step(model, u, mstack, dt, h, 2, borders,
                                    axes, correctors=specs, aux=aux)
            return (u, aux), None

        return jax.lax.scan(body, carry, None, length=K, unroll=2)[0]

    carry = scan_steps((jnp.asarray(u0), aux0))
    v = float(np.asarray(carry[0][0, 0, 0, 0]))
    assert np.isfinite(v)
    state = {"c": carry}

    def once():
        t0 = time.perf_counter()
        state["c"] = scan_steps(state["c"])
        float(np.asarray(state["c"][0][0, 0, 0, 0]))
        return (time.perf_counter() - t0) / (2 * K)

    t_step, spread = _repeat_timed(once)
    print(json.dumps({"path": "visco", "t_step": t_step,
                      "spread": spread}))


def _run_path_subprocess(path: str, shape):
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", path,
           "--shape", ",".join(map(str, shape))]
    timeout_s = PATH_TIMEOUTS.get(path, PATH_TIMEOUT_S)
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line), None
        return None, f"no result line (rc={out.returncode}): " \
                     f"{out.stderr.strip()[-300:]}"
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s}s"


def _run_path_with_retry(path: str, shape):
    rec, err = _run_path_subprocess(path, shape)
    if rec is None:
        # tunnel wedges are transient; one fresh-process retry
        rec, err2 = _run_path_subprocess(path, shape)
        err = f"{err}; retry: {err2}" if rec is None else None
    return (rec["t_step"] if rec else None), err, rec


def main(shape=None, only=None):
    """Full benchmark (default), or a single path when ``only`` is one of
    "jnp"/"pallas"/"fused" — the CLI's --shape/--path used to be parsed
    and silently ignored (code-review r5)."""
    shape = tuple(shape) if shape is not None else SHAPE
    npoints = int(np.prod(shape))

    if only is not None:
        t, err, rec = _run_path_with_retry(only, shape)
        print(json.dumps({
            "metric": "grid-points/s/chip (3D elastic GCM step)",
            "value": (npoints / t) if t else 0.0,
            "unit": "points/s", "vs_baseline": 1.0, "path": only,
            "shape": list(shape),
            **({"error": err} if err else {}),
            **({"spread": rec["spread"]} if rec and "spread" in rec
               else {}),
        }))
        return

    t_jnp, err_jnp, rec_jnp = _run_path_with_retry("jnp", shape)
    t_pal, err_pal, rec_pal = _run_path_with_retry("pallas", shape)
    t_fus, err_fus, rec_fus = _run_path_with_retry("fused", shape)
    t_sim, err_sim, rec_sim = _run_path_with_retry("simplex", shape)
    t_sct, err_sct, rec_sct = _run_path_with_retry("simplex_contact",
                                                   shape)
    t_con, err_con, rec_con = _run_path_with_retry("contact", shape)
    t_vis, err_vis, _ = _run_path_with_retry("visco", shape)

    results = {}
    if t_jnp:
        results["jnp"] = npoints / t_jnp
    if t_pal:
        results["pallas"] = npoints / t_pal
    if t_fus:
        results["fused"] = npoints / t_fus
    if not results:
        print(json.dumps({
            "metric": "grid-points/s/chip (3D elastic GCM step)",
            "value": 0.0, "unit": "points/s", "vs_baseline": 0.0,
            "error": f"jnp: {err_jnp}; pallas: {err_pal}; fused: {err_fus}",
        }))
        return

    best_name = max(results, key=results.get)
    best = results[best_name]
    base = results.get("jnp", best)
    extras = {}
    # relative spread (max-min)/median of the winning path's 3 interleaved
    # timing repetitions — the round-over-round comparability signal
    # (VERDICT r4 weak #6)
    best_rec = {"jnp": rec_jnp, "pallas": rec_pal,
                "fused": rec_fus}.get(best_name)
    if best_rec and "spread" in best_rec:
        extras["spread"] = best_rec["spread"]
    if err_pal:
        extras["pallas_error"] = err_pal
    if err_fus:
        extras["fused_error"] = err_fus
    if "pallas" in results:
        extras["pallas_points_per_s"] = round(results["pallas"], 1)
    if t_sim and rec_sim:
        # unstructured (BASELINE config 5) throughput, informational
        extras["simplex_points_per_s"] = round(
            rec_sim["npoints"] / t_sim, 1)
        if rec_sim.get("t_step_n65"):
            extras["simplex_points_per_s_n65"] = round(
                rec_sim["npoints_n65"] / rec_sim["t_step_n65"], 1)
        if rec_sim.get("simplex_path_n65"):
            # which sweep form won the interleaved A/B ("fused" = the
            # round-5 Pallas kernel, "jnp" = the roll-stencil path)
            extras["simplex_path_n65"] = rec_sim["simplex_path_n65"]
        if rec_sim.get("t_step_n65_jnp"):
            extras["simplex_points_per_s_n65_jnp"] = round(
                rec_sim["npoints_n65"] / rec_sim["t_step_n65_jnp"], 1)
    elif err_sim:
        extras["simplex_error"] = err_sim
    if t_sct and rec_sct:
        # unstructured 2-body contact/fracture (config 4 on tet meshes),
        # aggregate over both bodies (VERDICT r4 next #8)
        extras["simplex_contact_points_per_s"] = round(
            rec_sct["npoints"] / t_sct, 1)
        extras["simplex_contact_path"] = rec_sct.get("simplex_contact_path")
    elif err_sct:
        extras["simplex_contact_error"] = err_sct
    if t_con and rec_con:
        # multi-body contact/fracture (BASELINE config 4), aggregate over
        # both bodies, on the fused full-step composition
        extras["contact_points_per_s"] = round(rec_con["npoints"] / t_con, 1)
        extras["contact_path"] = rec_con.get("multi_path")
    elif err_con:
        extras["contact_error"] = err_con
    if t_vis:
        # viscoelastic+damage with in-kernel corrector epilogue
        extras["visco_points_per_s"] = round(npoints / t_vis, 1)
    elif err_vis:
        extras["visco_error"] = err_vis
    print(json.dumps({
        "metric": "grid-points/s/chip (3D elastic GCM step)",
        "value": round(best, 1),
        "unit": "points/s",
        "vs_baseline": round(best / base, 3),
        "path": best_name,
        "jnp_points_per_s": round(base, 1),
        "shape": list(shape),
        **extras,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None)
    ap.add_argument("--shape", default=",".join(map(str, SHAPE)))
    args = ap.parse_args()
    shape = tuple(int(x) for x in args.shape.split(","))
    if args.worker:
        run_worker(args.worker, shape)
    else:
        SHAPE = shape
        main()
