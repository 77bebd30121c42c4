"""Distribution: device-mesh domain decomposition (SURVEY.md §2 comp. 17)."""

from gcm_tpu.parallel.sharding import (  # noqa: F401
    domain_mesh, field_sharding, material_sharding, shard_state,
)
