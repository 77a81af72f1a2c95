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


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt out:
    PETSCTPU_NO_COMPILE_CACHE=1; dir override: the standard
    JAX_COMPILATION_CACHE_DIR). Solver setup compiles one program per
    (solver, operator-shape) pair; on remote-compile backends a single
    jit costs seconds, and the cache turns every repeat run (tests,
    benches, production restarts) into a sub-second replay. The
    reference ships the analogous idea as PetscInitialize-time
    one-time setup amortization; under XLA the compiled program IS the
    artifact worth persisting."""
    import os

    if os.environ.get("PETSCTPU_NO_COMPILE_CACHE"):
        return
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None and \
            jax.config.jax_compilation_cache_dir is None:
        # key the cache by a host-CPU fingerprint: XLA:CPU AOT results
        # embed the compile machine's feature set, and loading an
        # executable built on a different host can SIGILL/segfault
        # (cpu_aot_loader "machine type doesn't match" => crash in
        # get_executable_and_time). A TPU/host move just starts a
        # fresh cache directory.
        import hashlib
        import platform
        src = platform.machine() + platform.processor()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        src += line
                        break
        except OSError:
            pass
        tag = hashlib.sha1(src.encode()).hexdigest()[:10]
        path = os.path.expanduser(f"~/.cache/petsctpu-xla-{tag}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compile_cache()

from petsctpu.core.options import Options
from petsctpu.core.errors import ConvergedReason

__all__ = ["Options", "ConvergedReason", "__version__"]
