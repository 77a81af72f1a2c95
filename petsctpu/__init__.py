"""petsctpu — a TPU-native sparse linear-algebra and solver framework.

A from-scratch reimplementation of the capabilities of PETSc (reference:
erdc/petsc-dev) designed for TPU hardware: sharded vectors/matrices over
`jax.sharding.Mesh`, ELL-packed SpMV layouts for the VPU/MXU, halo exchange
via collectives inside `shard_map`, and Krylov/multigrid/Newton solvers
expressed as `lax.while_loop` programs.

Layer map (mirrors reference SURVEY.md §1):
  core     — options DB, logging/flops, error reasons, layouts   (≈ src/sys)
  vec      — vector ops, reductions, index sets                  (≈ src/vec)
  mat      — sparse/dense formats, assembly, factorizations      (≈ src/mat)
  parallel — device mesh, comm plans, sharded operators          (≈ MPI+VecScatter)
  ksp      — Krylov solvers                                      (≈ src/ksp/ksp)
  pc       — preconditioners                                     (≈ src/ksp/pc)
  snes     — nonlinear solvers                                   (≈ src/snes)
  ts       — time steppers                                       (≈ src/ts)
  dm       — structured grid manager (DMDA analog)               (≈ src/dm)
  models   — example problem builders (ex2/ex45/ex19 analogs)
"""

__version__ = "0.2.0"

from petsctpu.core.hostmem import tune_host_allocator as _tune

_tune()  # plan-time (host setup) allocator tuning; see core/hostmem.py

from petsctpu.core.options import Options
from petsctpu.core.errors import ConvergedReason

__all__ = ["Options", "ConvergedReason", "__version__"]
