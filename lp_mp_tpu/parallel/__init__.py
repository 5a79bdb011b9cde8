"""Multi-chip execution (jax.sharding / shard_map over a device mesh).

- ``grid``: row-sharded flagship grid-Potts engine with halo exchange.
"""
from .grid import ShardedGridPotts, mask_form, to_dense, mode_phases  # noqa: F401
