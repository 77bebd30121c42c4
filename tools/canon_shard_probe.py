"""Canonical layout under a 1-device mesh vs unsharded canonical: A/B.

VERDICT r4 next #3's on-chip anchor: the canonical+sharded contact
composition (contact axis leading, ('sy',)-mesh sharding the middle axis)
must cost ~nothing on one device relative to the round-4 unsharded
canonical path.  Interleaved timing in one process (tunnel protocol).

Usage: python tools/canon_shard_probe.py [n]  (default 256)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gcm_tpu.engine_multi import MultiBodyEngine
    from gcm_tpu.scenarios import elastic3d_contact

    bodies, contacts = elastic3d_contact(n=n, nsteps=40)
    bodies = {k: dataclasses.replace(t, kernel="pallas_fused")
              for k, t in bodies.items()}
    npts = sum(int(np.prod(t.grid.shape)) for t in bodies.values())
    K = 10

    def build(mesh):
        eng = MultiBodyEngine(bodies, contacts, mesh=mesh,
                              canonical_layout=True)
        assert eng._perm is not None, "canonical must engage"
        assert eng._fused_multi is not None, "fused composition must engage"
        params = eng._step_params()
        nsrc = len(eng._srcs)
        amp = jnp.full((nsrc,), 1e3, jnp.float32)

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

        return eng, scan_pairs, params

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("sx",))
    variants = {}
    for name, mesh in (("unsharded", None), ("mesh1", mesh1)):
        try:
            eng, fn, params = build(mesh)
            carry = fn((eng.us, eng.bonded, eng.auxs), params)
            v = float(np.asarray(carry[0]["upper"][0, 0, 0, 0]))
            assert np.isfinite(v)
            variants[name] = (fn, params, carry)
            print(json.dumps({"name": name, "compiled": True,
                              "perm": list(eng._perm),
                              "mesh_axes": (list(eng.mesh.axis_names)
                                            if eng.mesh else None)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name,
                              "compile_error": str(e)[-300:]}), flush=True)

    for rnd in range(3):
        for name, (fn, params, carry) in variants.items():
            t0 = time.perf_counter()
            carry = fn(carry, params)
            float(np.asarray(carry[0]["upper"][0, 0, 0, 0]))
            dtw = (time.perf_counter() - t0) / (2 * K)
            variants[name] = (fn, params, carry)
            print(json.dumps({"round": rnd, "name": name,
                              "ms_per_step": round(dtw * 1e3, 3),
                              "agg_points_per_s": round(npts / dtw, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
