"""Multi-device parallelism: element-sharded assembly over a device mesh.

The TPU-native replacement for the reference's MPI domain decomposition
(ParMesh + hypre, SURVEY.md §2.8): elements are sharded across devices with
``shard_map``; dof vectors stay replicated; local scatter + ``psum`` over
ICI performs the shared-dof assembly reduction that hypre's ParallelAssemble
does over MPI (ex4.cpp:119-120,:197-198).
"""

from .sharding import ShardedForm

__all__ = ["ShardedForm"]
