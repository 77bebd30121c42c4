"""Snapshots & seismograms (SURVEY.md §2 component 15)."""

from gcm_tpu.snapshot.vtk import write_vti, write_vtu  # noqa: F401
from gcm_tpu.snapshot.seismo import save_seismograms  # noqa: F401
