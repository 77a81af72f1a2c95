"""ksp ex53 + ex58 — MatAXPY, KSPSolveTranspose, stale-PC reuse.

ex53 (runex53, makefile:1012): tridiag + 0.5 at (0,n−1); LU PC. Three
solves: A x = b (1 it), Aᵀ x = b via KSPSolveTranspose (1 it), then a
rank-1 perturbation re-solved with the STALE LU as preconditioner
(SAME_PRECONDITIONER) — Krylov exactness gives 2 its. The checked-in
golden is EMPTY: every error stays under 1e-14. Oracle (instrumented
reference build): residuals 3.162277660168→1.2e-15, same, and
3.177411413277 → 7.830060686403e-03 → 1.4e-15.

ex58 (runex58[_baij/_sbaij], makefile:1062): C = A + 2·B via MatAXPY
with DIFFERENT_NONZERO_PATTERN, solved through aij, baij(bs=1) and
sbaij storage — all three match output/ex58.out: error 0.181393 in 19
iterations (oracle monitor stream identical across formats).
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.ksp import ksp_solve, ksp_solve_transpose
from petsctpu.mat import aij_from_scipy, sbaij_from_scipy
from petsctpu.mat.base import mat_axpy
from petsctpu.pc import make_pc
from petsctpu.pc.factor import make_lu
from petsctpu.pc.simple import make_jacobi


def ex53_matrix(n=10):
    A = sp.lil_matrix((n, n))
    for i in range(n):
        A[i, i] = 2.0
        if i > 0:
            A[i, i - 1] = -1.0
        if i < n - 1:
            A[i, i + 1] = -1.0
    A[0, n - 1] = 0.5          # non-symmetric
    return A.tocsr()


def ex58_matrices(n=20):
    A = sp.lil_matrix((n, n))
    for i in range(n):
        A[i, i] = 2.0
        if i > 0:
            A[i, i - 1] = -1.0
        if i < n - 1:
            A[i, i + 1] = -1.0
    # NOTE value[] is REASSIGNED by A's first-row setup (ex58.c:76), so
    # B's loop (ex58.c:89-92) stores diag = value[1] = -1 and antiband
    # = value[0] = +2 — making C = A + 2B ZERO-diagonal, which is what
    # the golden's slow 19-iteration Jacobi-GMRES solve actually tests
    # (PCJacobi's zero-diagonal -> 1.0 guard).
    B = sp.lil_matrix((n, n))
    for i in range(n):
        B[i, i] = -1.0
        j = n - i + n // 3
        if j < n:
            B[j, i] = 2.0
            B[i, j] = 2.0
    return A.tocsr(), B.tocsr()


class TestEx53:
    def test_three_solves_all_under_tol(self):
        n = 10
        A = ex53_matrix(n)
        u = np.ones(n)
        Ad = aij_from_scipy(A)
        pc = make_lu(A)

        # 1. A x = b with (exact) LU PC: one iteration
        b = jnp.asarray(A @ u)
        r1 = ksp_solve(Ad, b, pc=pc, ksp_type="gmres", rtol=1e-5,
                       atol=1e-50, cgs_refine="always")
        assert int(r1.its) == 1
        assert np.linalg.norm(np.asarray(r1.x) - u) < 1e-14

        # 2. Aᵀ x = b via KSPSolveTranspose + PCApplyTranspose
        bt = jnp.asarray(A.T @ u)
        r2 = ksp_solve_transpose(Ad, bt, pc=make_lu(A, transpose=True),
                                 ksp_type="gmres", rtol=1e-5, atol=1e-50,
                                 cgs_refine="always")
        assert int(r2.its) == 1
        assert np.linalg.norm(np.asarray(r2.x) - u) < 1e-14

        # 3. rank-1 perturbation, STALE LU kept as the preconditioner
        # (KSPSetOperators SAME_PRECONDITIONER): B⁻¹A' = I + rank-1 →
        # GMRES is exact at iteration 2
        A2 = mat_axpy(A, 1.0, sp.csr_matrix(([1.e-2], ([0], [n - 1])),
                                            shape=(n, n)), "same")
        b3 = jnp.asarray(A2 @ u)
        r3 = ksp_solve(aij_from_scipy(A2), b3, pc=pc, ksp_type="gmres",
                       rtol=1e-5, atol=1e-50, cgs_refine="always")
        assert int(r3.its) == 2
        assert np.linalg.norm(np.asarray(r3.x) - u) < 1e-14
        # oracle-pinned residuals
        h = np.asarray(r3.history[:3])
        np.testing.assert_allclose(
            h, [3.177411413277, 7.830060686403e-03, h[2]], rtol=1e-9)
        assert h[2] < 1e-12


GOLDEN_58 = [8.85689, 7.85496, 5.39266, 4.98309, 2.56364, 2.29512,
             1.32664, 1.27949, 1.09819, 1.02021, 0.952099, 0.813436,
             0.607115, 0.606013, 0.326142, 0.30309, 0.104325, 0.079702,
             0.044485, 9.608e-10]


class TestEx58:
    def _solve(self, Ad, C, b, pc):
        # ex58 never touches -ksp_gmres_cgs_refinement_type: classical
        # GS with NO refinement (the KSPGMRES default)
        return ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                         rtol=1e-5, atol=1e-50)

    def test_axpy_union_pattern(self):
        A, B = ex58_matrices()
        C = mat_axpy(A, 2.0, B, "different")
        # diagonal cancels to EXPLICIT zeros (union pattern keeps
        # them) — except i=13 where the antiband j=26−i lands ON the
        # diagonal and INSERT overwrites the −1 (so C[13,13]=2+2·2=6)
        d = C.diagonal()
        assert d[13] == 6.0
        assert np.all(np.delete(d, 13) == 0.0)
        for i in range(20):
            assert i in C[i].indices  # zero diag slots stored
        np.testing.assert_allclose((C - (A + 2 * B)).toarray(), 0)

    def test_ex58_aij_baij_sbaij(self):
        A, B = ex58_matrices()
        C = mat_axpy(A, 2.0, B, "different")
        u = np.ones(20)
        b = C @ u

        # aij + PCJacobi (zero diagonal -> identity scaling)
        Ad = aij_from_scipy(C)
        r = self._solve(Ad, C, b, make_jacobi(Ad))
        assert int(r.its) == 19
        np.testing.assert_allclose(np.asarray(r.history[:20]), GOLDEN_58,
                                   rtol=2e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r.x) - u), 0.181393, rtol=1e-4)

        # baij bs=1 (blocked storage, same stream)
        from petsctpu.mat import baij_from_scipy_bsr
        Bd = baij_from_scipy_bsr(C, bs=1)
        rb = self._solve(Bd, C, b, make_jacobi(Bd))
        assert int(rb.its) == 19
        np.testing.assert_allclose(np.asarray(rb.history[:20]), GOLDEN_58,
                                   rtol=2e-5)

        # sbaij (upper-triangle storage, scatter-add transpose mult)
        Sd = sbaij_from_scipy(C, bs=1)
        rs = self._solve(Sd, C, b, make_jacobi(Sd))
        assert int(rs.its) == 19
        np.testing.assert_allclose(np.asarray(rs.history[:20]), GOLDEN_58,
                                   rtol=2e-5)
