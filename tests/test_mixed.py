"""Mixed-precision iterative refinement (fp32 inner / fp64 outer)."""

import jax.numpy as jnp
import numpy as np

from petsctpu.ksp import ksp_solve
from petsctpu.ksp.mixed import solve_ir
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system
from petsctpu.pc import make_pc


class TestIR:
    def test_fp64_accuracy_from_fp32_solves(self):
        A, b, u = ex2_system(16, 16)
        A64 = aij_from_scipy(A)
        A32 = aij_from_scipy(A, dtype=np.float32)
        pc32 = make_pc("jacobi", A=A32)
        res = solve_ir(A64, A32, b, pc32=pc32, rtol=1e-12)
        assert int(res.reason) > 0
        err = np.abs(np.asarray(res.x) - u).max()
        assert err < 1e-11            # fp64-level accuracy...
        # ...which fp32-only CANNOT reach
        r32 = ksp_solve(A32, jnp.asarray(b, jnp.float32), pc=pc32,
                        ksp_type="gmres", rtol=1e-12, maxits=500)
        err32 = np.abs(np.asarray(r32.x) - u).max()
        assert err32 > 1e-8
        assert err < 1e-3 * err32

    def test_each_sweep_contracts(self):
        A, b, u = ex2_system(12, 12)
        A64 = aij_from_scipy(A)
        A32 = aij_from_scipy(A, dtype=np.float32)
        res = solve_ir(A64, A32, b, rtol=1e-12)
        h = np.asarray(res.history)
        h = h[np.isfinite(h)]
        assert len(h) >= 3
        # each refinement sweep contracts the true residual strongly
        assert all(h[i + 1] < 1e-3 * h[i] for i in range(len(h) - 1))
