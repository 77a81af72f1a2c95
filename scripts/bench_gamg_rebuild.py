"""GAMG hierarchy REBUILD time on device (the Newton/TS operator-
refresh path): ksp ex56 3-D elasticity (bs=3, rigid-body-mode
candidates), frozen symbolic plan + jitted numeric refresh via
comb-probe Galerkin (colored SpMV probing over the fast kernels,
pc/gamg_device.gamg_probe_plan — replaces the gather-bound SpGEMM
numerics of round 3 at 2.7 s/refresh; measured 115 ms on v5e).

Reference cost being replaced: PCSetUp_GAMG host re-setup
(gamg.c:533) — ~2.1 s host work per refresh after round-2's batched
QR. VERDICT r3 target: <= 300 ms on device.
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

    from petsctpu.models.elasticity import ex56_system
    from petsctpu.pc.asa import asa_tentatives
    from petsctpu.pc.gamg import rigid_body_modes
    from petsctpu.pc.gamg_device import (csr_data_of_matching,
                                         gamg_probe_plan)

    ne = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    A, b, coords = ex56_system(ne, 1e-3, dtype=np.float32)
    B = rigid_body_modes(coords, dof=3)
    t0 = time.time()
    p0s = asa_tentatives(A, B, coarse_n=80, bs=3)
    plan = gamg_probe_plan(A, p0s=p0s, coarse_n=1300, dtype=np.float32)
    plan_s = time.time() - t0
    a0 = jnp.asarray(csr_data_of_matching(A, np.float32))

    def fingerprint(pc):
        s = pc.coarse.lu[0, 0]
        for lev in pc.levels:
            s = s + lev.smoother.dinv[0] + lev.P.vals.reshape(-1)[0]
        return s

    # plan passed as a PYTREE ARGUMENT — closing over it bakes the
    # index arrays in as HLO constants (25+ min compiles)
    @jax.jit
    def reps(p, a_data, n):
        def body(i, s):
            pc = p.refresh(a_data * (1.0 + 1e-6 * i))
            return s + fingerprint(pc)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        s = float(reps(plan, a0, jnp.int32(n)))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    timed(1)
    lo = min(timed(2) for _ in range(3))
    hi = min(timed(12) for _ in range(3))
    per = (hi - lo) / 10.0
    print(json.dumps({
        "metric": "gamg_device_rebuild", "value": round(per * 1e3, 1),
        "unit": "ms_per_refresh",
        "detail": {"n": int(A.shape[0]), "nnz": int(A.nnz),
                   "levels": len(plan.levels) + 1,
                   "plan_build_s": round(plan_s, 2),
                   "host_resetup_baseline_s": 2.1}}))


if __name__ == "__main__":
    main()
