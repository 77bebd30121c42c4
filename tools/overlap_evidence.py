"""Halo/compute overlap evidence for the fused shard_map step.

BASELINE.json's north star asks for "halo exchange over ICI overlapped with
interior stencil compute".  With a single real chip we cannot time a
multi-chip overlap, so this tool commits the *dependence-graph* argument
(the collective-matmul-style schedule argument, VERDICT round-1 item 1):

XLA's latency-hiding scheduler runs an async collective concurrently with
any compute it has no data dependency on — on TPU, collective-permute
lowers to (collective-permute-start, collective-permute-done) and the
scheduler hoists independent work between them.  Overlap is therefore
guaranteed by construction iff, in one fused SPMD step
(gcm_tpu.parallel.fused_spmd.make_fused_spmd_step):

  - the INTERIOR pallas kernel (the O(area) work) is transitively
    independent of every ppermute — its operands are {state, materials};
  - only the RING kernel (O(perimeter) work) consumes the slabs.

This script traces the step on an 8-device mesh, walks the jaxpr dataflow
transitively from every ppermute, asserts the interior pallas_call is not
reached, and writes OVERLAP_EVIDENCE.md.

Run: python tools/overlap_evidence.py   (pins itself to 8 CPU devices)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _all_eqns(jx):
    for eq in jx.eqns:
        yield eq
        for sub in eq.params.values():
            if hasattr(sub, "jaxpr"):
                yield from _all_eqns(sub.jaxpr)
            elif hasattr(sub, "eqns"):
                yield from _all_eqns(sub)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        yield from _all_eqns(s.jaxpr)
                    elif hasattr(s, "eqns"):
                        yield from _all_eqns(s)


def _all_bodies(jx):
    yield jx
    for eq in jx.eqns:
        for sub in eq.params.values():
            if hasattr(sub, "jaxpr"):
                yield from _all_bodies(sub.jaxpr)
            elif hasattr(sub, "eqns"):
                yield from _all_bodies(sub)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        yield from _all_bodies(s.jaxpr)
                    elif hasattr(s, "eqns"):
                        yield from _all_bodies(s)


def _common_body(jx):
    """The (unique) jaxpr body whose DIRECT eqns hold both pallas_calls and
    the ppermutes. The taint pass compares vars by identity, which is only
    meaningful within one body — if a lowering change nested the permutes
    and the kernels in different sub-jaxprs, a flat-list walk would emit a
    vacuous PASS (advisor r2). Fails loudly instead."""
    for b in _all_bodies(jx):
        names = [e.primitive.name for e in b.eqns]
        if names.count("pallas_call") >= 2 and "ppermute" in names:
            return b
    raise AssertionError(
        "no single jaxpr body contains both pallas_calls and the "
        "ppermutes — the overlap taint check cannot run on this lowering; "
        "update tools/overlap_evidence.py for the new structure")


def check(dim: int):
    """Build one fused SPMD step (3D or 2D) and run the taint check.

    Returns (report_lines, ok)."""
    from gcm_tpu.materials import MaterialFields
    from gcm_tpu.models.spec import get_model
    from gcm_tpu.parallel.fused_spmd import (
        extended_mstack, extended_mstack_2d, make_fused_spmd_step,
        make_fused_spmd_step_2d)
    from gcm_tpu.parallel.sharding import domain_mesh, field_sharding
    from gcm_tpu.task import BorderSpec

    shape = (64, 64, 16) if dim == 3 else (96, 24)
    model = get_model(f"elastic{dim}d")
    rng = np.random.default_rng(0)
    rho = 1000.0 * (1.0 + 0.5 * rng.random(shape))
    mu = 1e9 * (0.5 + rng.random(shape))
    lam = 1e9 * (1.0 + rng.random(shape))
    mat = MaterialFields.from_arrays(rho, lam, mu, xp=jnp, dtype=jnp.float32)
    dt = 0.5 / float(np.sqrt((lam + 2 * mu) / rho).max())
    borders = {(a, s): BorderSpec("absorbing")
               for a in range(dim) for s in (0, 1)}
    if dim == 3:
        mesh = domain_mesh(3, devices=jax.devices("cpu")[:8], shape=(4, 2))
        mext = extended_mstack(model, mat, mesh, 2)
        step = make_fused_spmd_step(model, mesh, dt, (1.0,) * 3, 2, borders,
                                    bx=4, by=8)
        axes = (0, 1, 2)
    else:
        mesh = domain_mesh(2, devices=jax.devices("cpu")[:4])
        mext = extended_mstack_2d(model, mat, mesh)
        step = make_fused_spmd_step_2d(model, mesh, dt, (1.0,) * 2, 2,
                                       borders, bx=8)
        axes = (0, 1)
    u = jax.device_put(
        jnp.zeros((model.ncomp,) + shape, jnp.float32),
        field_sharding(mesh, dim))
    jaxpr = jax.make_jaxpr(lambda a, b: step(a, b, axes))(u, mext)

    flat = list(_all_eqns(jaxpr.jaxpr))
    n_pallas_total = sum(e.primitive.name == "pallas_call" for e in flat)
    n_perm_total = sum(e.primitive.name == "ppermute" for e in flat)
    body = _common_body(jaxpr.jaxpr)
    eqns = list(body.eqns)
    pallas = [e for e in eqns if e.primitive.name == "pallas_call"]
    ppermutes = [e for e in eqns if e.primitive.name == "ppermute"]
    assert len(pallas) == 2, f"expected interior+ring pallas, got {len(pallas)}"
    assert ppermutes, "no ppermute found — slabs were not exchanged"
    assert len(pallas) == n_pallas_total and len(ppermutes) == n_perm_total, (
        "pallas_calls/ppermutes exist outside the common body "
        f"({n_pallas_total} pallas, {n_perm_total} permutes total vs "
        f"{len(pallas)}/{len(ppermutes)} in-body) — taint check would be "
        "incomplete")
    interior = min(pallas, key=lambda e: len(e.invars))
    ring = max(pallas, key=lambda e: len(e.invars))

    # transitive taint from every ppermute output through the dataflow
    # (vars are compared by object identity — names collide across
    # sub-jaxprs; the permutes and both pallas calls share one body jaxpr)
    lit = jax.extend.core.Literal
    tainted: set = set()
    for eq in eqns:
        if eq.primitive.name == "ppermute" or any(
                (not isinstance(v, lit)) and id(v) in tainted
                for v in eq.invars):
            tainted.update(id(v) for v in eq.outvars)

    def op_taint(eqn):
        return [str(v) for v in eqn.invars
                if not isinstance(v, lit) and id(v) in tainted]

    interior_tainted = op_taint(interior)
    ring_tainted = op_taint(ring)
    ok = (not interior_tainted) and bool(ring_tainted)

    slab_kind = ("x-slab pair + corner-complete y-slab pair" if dim == 3
                 else "x-slab pair, 8-row aligned")
    report = [
        f"[{dim}D] ppermute eqns in one step: {len(ppermutes)} "
        f"({slab_kind})",
        f"[{dim}D] interior pallas_call: {len(interior.invars)} operands; "
        f"ppermute-tainted operands: {interior_tainted or 'NONE'}",
        f"[{dim}D] ring pallas_call: {len(ring.invars)} operands; "
        f"ppermute-tainted operands: {len(ring_tainted)} "
        "(the exchanged slabs + face flags path)",
    ]
    return report, ok


def main() -> int:
    reports = []
    all_ok = True
    for dim in (3, 2):
        rep, ok = check(dim)
        reports.extend(rep)
        all_ok = all_ok and ok
    report = reports
    ok = all_ok
    md = [
        "# Halo/compute overlap evidence (fused SPMD step)",
        "",
        "Generated by `tools/overlap_evidence.py` on virtual CPU meshes",
        "(3D: 4x2 over 8 devices; 2D: 4 over the sharded x axis): one",
        "fused step of each multi-chip production path",
        "(`gcm_tpu.parallel.fused_spmd`), elastic, order 2, absorbing",
        "borders.",
        "",
        "**Claim.** The step's O(area) work — the interior Pallas kernel —",
        "is transitively independent of every `ppermute` (the halo slab",
        "exchange); only the O(perimeter) ring kernel consumes the slabs.",
        "XLA lowers `ppermute` to async `collective-permute-start/done` and",
        "its latency-hiding scheduler serializes a collective only against",
        "its data dependents, so the slab exchange runs concurrently with",
        "the interior stencil compute — the same scheduling argument that",
        "overlaps collective-matmul. The ring kernel then waits only for",
        "the (tiny) slabs: 2*r rows per sharded axis, <2% of the state at",
        "production shard sizes; ring/interior tile ratio shrinks as",
        "2(ntx+nty)/(ntx*nty).",
        "",
        "**Mechanical check (transitive jaxpr dataflow, this run):**",
        "",
        "```",
        *report,
        "```",
        "",
        f"**Verdict: {'PASS' if ok else 'FAIL'}** — interior kernel "
        "independent of the exchange; slabs flow only into the ring kernel.",
    ]
    out = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "OVERLAP_EVIDENCE.md"))
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(report))
    print("verdict:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
