"""Multi-chip parallelism (mesh construction + sharded multipass PIV)."""

from .mesh import default_piv_mesh, make_mesh
from .sharded import ShardedPIV

__all__ = ["make_mesh", "default_piv_mesh", "ShardedPIV"]
