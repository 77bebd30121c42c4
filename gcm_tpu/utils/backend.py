"""Where will this computation actually run?

``jax.default_backend()`` answers "what is the process default platform",
which is the wrong question in two situations this framework meets:

- a ``jax.sharding.Mesh`` built over CPU devices inside a process whose
  default backend is a TPU — e.g. the driver's multichip validation on N
  virtual CPU devices when a TPU plugin force-registers itself despite
  ``JAX_PLATFORMS=cpu`` (observed in this image: ``jax.default_backend()``
  returns ``"tpu"`` while ``jax.devices("cpu")`` carries the 8 virtual
  devices the run is actually sharded over);
- an explicit ``jax.default_device(...)`` override scoping work to a
  non-default platform.

Every interpret-mode default and every "are we on TPU hardware" shape
guard in the framework goes through :func:`compute_platform` so those
decisions track the devices the arrays will really live on.
"""

from __future__ import annotations

from typing import Optional

import jax


def compute_platform(mesh=None) -> str:
    """Platform name ("tpu", "cpu", ...) compute will execute on.

    With ``mesh`` given, that is the platform of the mesh's devices
    (authoritative: ``shard_map``/GSPMD place the computation there no
    matter what the process default is). Otherwise the active
    ``jax.default_device`` override wins, then the process default
    backend.
    """
    if mesh is not None:
        try:
            dev = next(iter(mesh.devices.flat))
            return dev.platform
        except (AttributeError, StopIteration, TypeError):
            pass
    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None:
        platform = getattr(dd, "platform", dd if isinstance(dd, str) else None)
        if platform:
            return str(platform)
    return jax.default_backend()


def on_tpu(mesh=None) -> bool:
    """True when compute lands on real TPU hardware (Mosaic constraints
    apply: 128-lane alignment, no interpret mode)."""
    return compute_platform(mesh) == "tpu"


def default_interpret(mesh=None, interpret: Optional[bool] = None) -> bool:
    """Resolve an ``interpret: Optional[bool]`` kernel argument: explicit
    values win; ``None`` means "interpret unless on TPU hardware"."""
    if interpret is not None:
        return bool(interpret)
    return not on_tpu(mesh)
