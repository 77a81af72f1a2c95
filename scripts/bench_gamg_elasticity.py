"""Time-to-solution: GAMG(RBM)-preconditioned CG on ksp ex56's 3-D
elasticity (24000 dof, 6 rigid-body-mode candidates) — the algebraic-
multigrid production workload on one chip. Dispatch-corrected timing
(two solve runs with different maxits; difference cancels tunnel
overhead). Prints one JSON line."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from petsctpu.core.options import Options
    from petsctpu.ksp import ksp_solve
    from petsctpu.mat import aij_from_scipy
    from petsctpu.models.elasticity import ex56_system
    from petsctpu.pc import make_pc

    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    fmt = sys.argv[2] if len(sys.argv) > 2 else "ell"
    A, b, coords = ex56_system(ne, 1e-3, dtype=np.float32)
    Ad = aij_from_scipy(A, dtype=np.float32)
    t0 = time.time()
    pc = make_pc("gamg", A=Ad, A_host=A, options=Options(
        {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 3,
         "pc_gamg_coordinates": coords, "pc_gamg_mat_type": fmt}))
    setup_s = time.time() - t0
    bj = jnp.asarray(b, jnp.float32)

    def run(maxits):
        t = time.time()
        r = ksp_solve(Ad, bj, pc=pc, ksp_type="cg", rtol=1e-5,
                      atol=1e-30, maxits=maxits)
        _ = float(r.rnorm)               # forces completion
        return time.time() - t, int(r.its), int(r.reason)

    run(2)                                # compile both executables?
    run(12)
    t2, _, _ = run(2)
    t12, its, reason = run(12)
    per_it = (t12 - t2) / 10.0
    print(json.dumps({
        "metric": "gamg_rbm_elasticity_cg_iteration", "fmt": fmt,
        "value": round(per_it * 1e3, 3), "unit": "ms_per_iteration",
        "detail": {"n": int(A.shape[0]), "nnz": int(A.nnz),
                   "its_to_rtol1e-5": its, "reason": reason,
                   "setup_s": round(setup_s, 2),
                   "oracle_reference_its": 13}}))


if __name__ == "__main__":
    main()
