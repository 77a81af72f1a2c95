from petsctpu.parallel.pmat import ShardedAIJ, sharded_aij_from_scipy
from petsctpu.parallel.pstencil import ShardedStencil, sharded_stencil_from
from petsctpu.parallel.api import ParKSP, par_ksp_solve, shard_vector, unshard_vector

__all__ = ["ShardedAIJ", "sharded_aij_from_scipy", "ShardedStencil",
           "sharded_stencil_from", "ParKSP", "par_ksp_solve",
           "shard_vector", "unshard_vector"]
