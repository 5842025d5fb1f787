"""Distribution layer: device meshes, sharding rules, multi-chip programs.

The reference has no on-device parallelism at all (its "parallelism" is a
host thread pool, speaker-process:627-642); this package is designed fresh
per SURVEY.md §2.3: a ``data × model`` ``jax.sharding.Mesh``, GSPMD
sharding via ``NamedSharding``/``with_sharding_constraint``, and XLA
collectives over ICI.
"""

from .mesh import make_mesh, mesh_axes, parse_mesh_spec
from .sharding import batch_sharding, ecapa_param_spec, replicate, shard_params

__all__ = [
    "make_mesh",
    "mesh_axes",
    "parse_mesh_spec",
    "batch_sharding",
    "ecapa_param_spec",
    "replicate",
    "shard_params",
]
