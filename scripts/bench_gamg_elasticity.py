"""Time-to-solution: GAMG(RBM)-preconditioned CG on ksp ex56's 3-D
elasticity (24000 dof, 6 rigid-body-mode candidates) — the algebraic-
multigrid production workload on one chip. Timing: K whole fixed-
iteration solves scanned inside ONE dispatch (host-level deltas sit
inside the relay's ±5 ms dispatch jitter — PARITY.md r5). Prints one
JSON line. Usage: bench_gamg_elasticity.py [ne] [fmt: auto|ell|band]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from petsctpu.core.options import Options
    from petsctpu.ksp import ksp_solve
    from petsctpu.ksp.cg import solve_cg
    from petsctpu.ksp.common import KSPConfig
    from petsctpu.mat import aij_from_scipy
    from petsctpu.mat.factory import mat_from_options
    from petsctpu.models.elasticity import ex56_system
    from petsctpu.pc import make_pc

    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    fmt = sys.argv[2] if len(sys.argv) > 2 else "auto"
    A, b, coords = ex56_system(ne, 1e-3, dtype=np.float32)
    # outer operator through -mat_type auto (round 5: the default path
    # IS the fast path; an ELL outer gather at 1.76M nnz costs more
    # than the whole V-cycle)
    Aop, perm = mat_from_options(A, mat_type="auto", dtype=np.float32)
    if perm is not None:
        Aop = aij_from_scipy(A, dtype=np.float32)
    t0 = time.time()
    pc = make_pc("gamg", A=Aop, A_host=A, options=Options(
        {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 3,
         "pc_gamg_coordinates": coords, "pc_gamg_mat_type": fmt}))
    setup_s = time.time() - t0
    bj = jnp.asarray(b, jnp.float32)

    r = ksp_solve(Aop, bj, pc=pc, ksp_type="cg", rtol=1e-5,
                  atol=1e-30, maxits=100)
    its, reason = int(r.its), int(r.reason)

    cfg = KSPConfig(rtol=1e-30, atol=1e-38, maxits=max(its, 6))
    x0 = jnp.zeros_like(bj)

    @jax.jit
    def chain(b_, salts):
        def step(acc, s):
            res = solve_cg(Aop, b_ * (1 + s), x0, pc, cfg)
            return acc + res.x[0], None
        return lax.scan(step, jnp.float32(0), salts)[0]

    def t(K):
        salts = jnp.asarray(np.arange(1, K + 1, dtype=np.float32)
                            * np.float32(1e-6))
        t0 = time.time()
        float(chain(bj, salts))
        return time.time() - t0

    t(2), t(12)
    d = (min(t(12) for _ in range(2)) - min(t(2) for _ in range(2))) \
        / (10 * cfg.maxits)
    print(json.dumps({
        "metric": "gamg_rbm_elasticity_cg_iteration", "fmt": fmt,
        "value": round(d * 1e3, 3), "unit": "ms_per_iteration",
        "detail": {"n": int(A.shape[0]), "nnz": int(A.nnz),
                   "outer_format": type(Aop).__name__,
                   "its_to_rtol1e-5": its, "reason": reason,
                   "setup_s": round(setup_s, 2),
                   "oracle_reference_its": 13}}))


if __name__ == "__main__":
    main()
