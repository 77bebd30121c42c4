"""Grids: structured (implicit, task.GridSpec) and simplex meshes."""

from gcm_tpu.grids.simplex import SimplexGrid, FootTables  # noqa: F401
