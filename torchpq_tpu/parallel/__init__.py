"""Multi-chip execution over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.7: no distributed backend exists);
multi-chip scaling is a native capability of this framework: IVF cells shard
over the mesh, codebooks replicate, per-shard fused scans merge with an
all-gather top-k over ICI (SURVEY.md §5.8).
"""

from .mesh import get_mesh, device_count
from .sharded_ivfpq import (ShardedIVFPQSearcher, data_parallel_lloyd_step,
                            data_parallel_kmeans_fit, data_parallel_search)
