from petsctpu.parallel.pmat import ShardedAIJ, sharded_aij_from_scipy
from petsctpu.parallel.pbaij import ShardedBAIJ, sharded_baij_from_scipy
from petsctpu.parallel.pstencil import ShardedStencil, sharded_stencil_from
from petsctpu.parallel.api import ParKSP, par_ksp_solve, shard_vector, unshard_vector
from petsctpu.parallel.subcomm import nested_mesh, sub_ksp_solve
from petsctpu.parallel.hier import (ShardedAIJHier,
                                    sharded_aij_hier_from_scipy)
from petsctpu.parallel.psnes import (ShardedFDJac, pad_shard,
                                     par_snes_solve, par_ts_solve)

__all__ = ["ShardedAIJ", "sharded_aij_from_scipy", "ShardedBAIJ",
           "sharded_baij_from_scipy", "ShardedStencil",
           "sharded_stencil_from", "ParKSP", "par_ksp_solve",
           "shard_vector", "unshard_vector", "nested_mesh",
           "sub_ksp_solve", "ShardedAIJHier",
           "sharded_aij_hier_from_scipy", "ShardedFDJac", "pad_shard",
           "par_snes_solve", "par_ts_solve"]
