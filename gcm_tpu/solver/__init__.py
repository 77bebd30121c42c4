"""GCM solver: dimensional-splitting step, boundary and contact handling."""

from gcm_tpu.solver.gcm import stage, step, cfl_dt  # noqa: F401
