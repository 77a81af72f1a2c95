"""Specialty PCs: galerkin, redistribute, lsc, svd, cp, eisenstat."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.options import Options
from petsctpu.dm.da import DA
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.pc import make_pc


class TestSVD:
    def test_exact_in_one_iteration(self):
        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        pc = make_pc("svd", A=Ad, A_host=A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="richardson",
                        rtol=1e-12, maxits=10)
        assert res.converged and int(res.its) <= 2
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-9)

    def test_rank_deficient(self):
        """Singular system: SVD PC drops the null space (svd.c cutoff)."""
        A = sp.diags([0.0, 1.0, 2.0, 3.0]).tocsr()
        pc = make_pc("svd", A_host=A)
        y = pc.apply(jnp.asarray([1.0, 1.0, 1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(y), [0.0, 1.0, 0.5, 1 / 3],
                                   atol=1e-12)


class TestRedistribute:
    def test_dirichlet_rows_stripped(self):
        """Laplacian with identity boundary rows: the reduced interior
        is solved, boundary comes straight from the rhs."""
        da = DA((7, 7))
        A = da.create_matrix()
        # build 2-D Laplacian with identity boundary rows on host
        n = 7
        Ah = sp.lil_matrix((49, 49))
        for i in range(n):
            for j in range(n):
                k = i * n + j
                if i in (0, n - 1) or j in (0, n - 1):
                    Ah[k, k] = 1.0
                else:
                    Ah[k, k] = 4.0
                    Ah[k, k - 1] = Ah[k, k + 1] = -1.0
                    Ah[k, k - n] = Ah[k, k + n] = -1.0
        Ah = Ah.tocsr()
        rng = np.random.default_rng(3)
        xex = rng.standard_normal(49)
        b = Ah @ xex
        pc = make_pc("redistribute", A_host=Ah)
        x = pc.apply(jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), xex, atol=1e-10)


class TestGalerkin:
    def test_coarse_projection_pc(self):
        A, b, u = ex2_system(9, 9)
        Ad = aij_from_scipy(A)
        da = DA((9, 9))
        coarse = da.coarsen()
        P = da.interpolation(coarse)
        from petsctpu.dm.da import q1_interp_scipy
        Ph = q1_interp_scipy(da.grid, coarse.grid)
        pc = make_pc("galerkin", A=Ad, A_host=A, options=Options({
            "pc_galerkin_interpolation": P,
            "pc_galerkin_interpolation_host": Ph}))
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                        rtol=1e-8, maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-5)


class TestCP:
    def test_nonsymmetric(self):
        A = laplacian_2d(6, 6).tolil()
        for i in range(35):
            A[i, i + 1] += 0.3
        A = A.tocsr()
        Ad = aij_from_scipy(A)
        b = np.ones(36)
        pc = make_pc("cp", A=Ad, A_host=A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                        rtol=1e-9, maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)


class TestEisenstat:
    def test_matches_ssor_history(self):
        """Eisenstat = SSOR preconditioning: identical iteration count."""
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        r1 = ksp_solve(Ad, jnp.asarray(b),
                       pc=make_pc("eisenstat", A=Ad, A_host=A),
                       ksp_type="cg", rtol=1e-10)
        r2 = ksp_solve(Ad, jnp.asarray(b),
                       pc=make_pc("sor", A=Ad, A_host=A,
                                  options=Options({"pc_sor_symmetric":
                                                   "true"})),
                       ksp_type="cg", rtol=1e-10)
        assert int(r1.its) == int(r2.its)
        np.testing.assert_allclose(np.asarray(r1.x), u, atol=1e-8)


class TestLSC:
    def test_stokes_schur(self):
        """Small Stokes-like saddle point: fieldsplit-Schur with an LSC
        inner approximation converges on the pressure block."""
        rng = np.random.default_rng(0)
        nv, npr = 24, 8
        A00 = (laplacian_2d(6, 4) + 0.5 * sp.eye(24)).tocsr()
        B = sp.csr_matrix(rng.standard_normal((npr, nv)) * 0.5)
        # Schur complement S = B A00^{-1} B^T (SPD here)
        S = B @ np.linalg.inv(A00.toarray()) @ B.T
        pc = make_pc("lsc", options=Options({"pc_lsc_a00": A00,
                                             "pc_lsc_b": B}))
        from petsctpu.mat.dense import Dense
        Sd = Dense(jnp.asarray(S))
        bb = rng.standard_normal(npr)
        res = ksp_solve(Sd, jnp.asarray(bb), pc=pc, ksp_type="fgmres",
                        rtol=1e-10, maxits=200)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.linalg.solve(S, bb), atol=1e-7)


class TestSupportGraph:
    """Vaidya spanning-tree PC (reference impls/supportgraph, C++)."""

    def test_tree_structure(self):
        from petsctpu.pc.supportgraph import support_tree
        from petsctpu.models import laplacian_2d
        A = laplacian_2d(8, 8)
        T = support_tree(A)
        # spanning tree: n-1 symmetric off-diagonal pairs + n diagonal
        offdiag = T.nnz - 64
        assert offdiag == 2 * 63
        # subset of A's entries
        diff = abs(A.multiply(T != 0) - T)
        assert diff.max() < 1e-14

    def test_accelerates_cg_anisotropic(self):
        """Support-graph theory's home turf: the spanning tree captures
        the dominant coupling direction of an anisotropic operator
        (measured here: 13 its vs 104 unpreconditioned)."""
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        m = 24
        ex = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (m, m))
        I = sp.eye(m)
        A = (sp.kron(I, ex) + 1e-2 * sp.kron(ex, I)).tocsr()
        Ad = aij_from_scipy(A)
        b = jnp.asarray(np.ones(m * m))
        pc = make_pc("supportgraph", A=Ad, A_host=A)
        r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8, maxits=600)
        r0 = ksp_solve(Ad, b, ksp_type="cg", rtol=1e-8, maxits=600)
        assert r.converged
        assert int(r.its) < int(r0.its) // 3
        np.testing.assert_allclose(A @ np.asarray(r.x), 1.0, atol=1e-6)

    def test_isotropic_converges(self):
        from petsctpu.models import laplacian_2d
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        A = laplacian_2d(12, 12)
        Ad = aij_from_scipy(A)
        b = jnp.asarray(np.ones(144))
        pc = make_pc("supportgraph", A=Ad, A_host=A)
        r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8, maxits=200)
        assert r.converged and int(r.its) < 60
        np.testing.assert_allclose(A @ np.asarray(r.x), 1.0, atol=1e-6)


def _ex32_matrix(M=8):
    """The ex32.c operator (ksp/examples/tests/ex32.c): 8³ 7-point
    DMDA Laplacian, symmetrized and halved (ex32.c:58-60). DMDA
    matrices store explicit ZEROS at every in-domain stencil position
    (fdda.c zero-filled MatSetValues) — the IC(k≥1) level pattern
    grows from those structural zeros, so they must be kept (scipy
    binops prune exact zeros; build the symmetrized values directly
    in COO)."""
    import scipy.sparse as sp

    w = 1.0 / (M - 1)
    N = M ** 3

    def idx(i, j, k):
        return i + M * (j + M * k)

    def interior(i, j, k):
        return 0 < i < M - 1 and 0 < j < M - 1 and 0 < k < M - 1

    rows, cols, vals = [], [], []
    for k in range(M):
        for j in range(M):
            for i in range(M):
                r0 = idx(i, j, k)
                rows.append(r0); cols.append(r0); vals.append(6.0 * w)
                for ci, cj, ck in ((i - 1, j, k), (i + 1, j, k),
                                   (i, j - 1, k), (i, j + 1, k),
                                   (i, j, k - 1), (i, j, k + 1)):
                    if 0 <= ci < M and 0 <= cj < M and 0 <= ck < M:
                        v_rc = -w if interior(i, j, k) else 0.0
                        v_cr = -w if interior(ci, cj, ck) else 0.0
                        rows.append(r0); cols.append(idx(ci, cj, ck))
                        vals.append(0.5 * (v_rc + v_cr))
    A = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))
    A.sort_indices()
    return A


class TestICCLevelRule:
    # ksp/examples/tests/output/ex32_5.out blocks [1]-[4]
    GOLDEN = {
        0: ['0.210648', '0.0786582', '0.0118368', '0.0011481',
            '0.000133466', '9.08641e-06', '4.55986e-07'],
        1: ['0.324333', '0.0504078', '0.00224249', '8.18975e-05',
            '4.93908e-06', '5.52773e-07'],
        2: ['0.388485', '0.0301977', '0.000785933', '2.45825e-05',
            '1.31389e-06'],
        3: ['0.443709', '0.0131473', '0.00015825', '3.04436e-06'],
    }

    def test_ex32_testset5_cg_icc_levels_digit_exact(self):
        """runex32_testset5 natural-ordering rows: CG + true ICC(k)
        (UᵀDU numeric, IC(k) column-driven level pattern) reproduces
        the reference's -ksp_monitor_short streams DIGIT-EXACT for
        level fill 0..3."""
        from petsctpu.ksp.common import _fmt_short
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.factor import make_icc

        A = _ex32_matrix()
        b = jnp.asarray(np.full(A.shape[0], 1.0 / (7 ** 3)))
        Ad = aij_from_scipy(A)
        for lev in range(4):
            pc = make_icc(A, levels=lev)
            r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-5,
                          atol=1e-50)
            hist = [_fmt_short(float(h))
                    for h in np.asarray(r.history)[:int(r.its) + 1]]
            assert hist == self.GOLDEN[lev], (lev, hist)

    def test_ex32_testset5_cg_cholesky(self):
        """ex32_5.out block [9]: complete cholesky converges at it 1
        with r0 0.491924."""
        from petsctpu.ksp.common import _fmt_short
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.api import make_pc

        A = _ex32_matrix()
        b = jnp.asarray(np.full(A.shape[0], 1.0 / (7 ** 3)))
        Ad = aij_from_scipy(A)
        pc = make_pc("cholesky", A=Ad, A_host=A)
        r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-5, atol=1e-50)
        assert int(r.its) == 1
        assert _fmt_short(float(r.history[0])) == "0.491924"
        assert float(r.history[1]) < 1e-11

    def test_icc_identity_utdu_on_pattern(self):
        """A ≈ UᵀDU must be EXACT on the IC(0) pattern entries."""
        import scipy.sparse as sp

        from petsctpu.mat.factor import icc_factor
        from petsctpu.models import laplacian_2d

        A = laplacian_2d(7, 7)
        U, d, nshift, shift = icc_factor(A)
        assert nshift == 0 and shift == 0.0
        n = A.shape[0]
        M = ((sp.eye(n) + U).T @ sp.diags(d) @ (sp.eye(n) + U)).tocsr()
        Au = sp.triu(A).tocsr()
        for i in range(n):
            for p in range(Au.indptr[i], Au.indptr[i + 1]):
                assert abs(M[i, Au.indices[p]] - Au.data[p]) < 1e-14

    def test_manteuffel_shift_indefinite(self):
        """MAT_SHIFT_POSITIVE_DEFINITE (the PCICC default, icc.c:198):
        on a mildly indefinite shifted Laplacian the factorization must
        restart with a diagonal shift (nshift>0), produce positive
        pivots, and still precondition CG on the SPD part."""
        from petsctpu.mat.factor import icc_factor
        from petsctpu.models import laplacian_2d

        A = (laplacian_2d(10, 10) - 2.0 * sp.eye(100)).tocsr()
        U, d, nshift, shift = icc_factor(A)
        assert nshift > 0 and shift > 0
        assert (d > 0).all()

    def test_zero_pivot_raises_without_shift(self):
        """shift_type='none' = MatPivotCheck_none: an exactly-zero
        pivot is a hard error (matimpl.h:572-585)."""
        import pytest

        from petsctpu.mat.factor import icc_factor

        A = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 2.0]]))
        with pytest.raises(ZeroDivisionError):
            icc_factor(A, shift_type="none")

    def test_iluk_monotone_fill_improves(self):
        """More level fill must not slow convergence (the bug this
        guards: the fill pattern silently pruned back to ILU(0))."""
        import scipy.sparse as sp

        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import laplacian_2d
        from petsctpu.pc.factor import make_ilu

        A = laplacian_2d(20, 20)
        b = jnp.asarray(np.ones(400))
        Ad = aij_from_scipy(A)
        its = []
        for lev in (0, 1, 2):
            pc = make_ilu(A, levels=lev)
            r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8,
                          atol=1e-50)
            its.append(int(r.its))
        assert its[1] < its[0] and its[2] <= its[1], its


class TestILUDT:
    def test_iludt_matches_reference_source_directly(self):
        """mat factor ILUDT (MatILUDTFactor_SeqAIJ, aijfact.c:3230)
        validated against a DIRECT call into the reference source (the
        oracle build; the tree's own PCILU options path never reaches
        it — -pc_factor_drop_tolerance is a no-op there, so ksp ex2_7
        actually runs ILU(0); see test_ex2_7 below). The port
        replicates the incremental im[]-limited fill scans, the
        |multiplier|>dt update-dropping, the PetscSortSplit
        quickselect row cuts (tie behavior included), and the
        persistent-rtmp leak across rows. MatSolve values on the ex2
        8×7 system with dt=0.01, dtcount=2 agree to the reference
        print precision."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        from petsctpu.models import ex2_system
        from petsctpu.pc.factor import iludt_factor_host, make_iludt

        A, b, u = ex2_system(8, 7)
        L, U = iludt_factor_host(A, dt=0.01, dtcount=2)
        r = np.arange(1.0, 57.0)
        y = spla.spsolve_triangular(sp.csr_matrix(L + sp.eye(56)), r,
                                    lower=True)
        y = spla.spsolve_triangular(sp.csr_matrix(U), y, lower=False)
        oracle_head = [11.0729, 19.7591, 25.392, 27.7288, 26.8448,
                       22.4462, 13.8432, 23.5324, 40.5717, 51.0799]
        np.testing.assert_allclose(y[:10], oracle_head, rtol=5e-6)
        # the device PC applies the same factor
        pc = make_iludt(A, dt=0.01, dtcount=2)
        yd = np.asarray(pc.apply(jnp.asarray(r)))
        np.testing.assert_allclose(yd, y, rtol=1e-12)

    def test_ex2_7_drop_tolerance_noop(self):
        """runex2_7 (-pc_type ilu -pc_factor_drop_tolerance
        0.01,0.0,2): in the reference TREE the dt options never reach
        the factorization (PCSetUp_ILU ilu.c:216 calls the ordinary
        MatILUFactorSymbolic; the shipped golden '4 iterations' is
        stale) — the oracle prints ILU(0) behavior: 6 iterations,
        error 0.000156044. Reproduced with plain ILU(0)."""
        from petsctpu.models import ex2_system
        from petsctpu.pc import make_pc

        A, b, u = ex2_system(8, 7)
        pc = make_pc("ilu", A=aij_from_scipy(A), A_host=A)
        r = ksp_solve(aij_from_scipy(A), jnp.asarray(b), pc=pc,
                      ksp_type="gmres", rtol=1e-2 / 72, atol=1e-50,
                      maxits=10000)
        assert int(r.its) == 6
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r.x) - u), 0.000156044, rtol=1e-4)
