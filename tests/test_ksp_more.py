"""Tests for the second batch of Krylov methods (ksp/more.py):
SYMMLQ, GCR, BiCGStab(l), trust-region CG (STCG/NASH/GLTR), LGMRES."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.errors import ConvergedReason
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.pc import make_pc


def _nonsym(n=8):
    A = laplacian_2d(n, n).tolil()
    for i in range(n * n - 1):
        A[i, i + 1] += 0.4
    return A.tocsr()


class TestSymmlq:
    def test_spd(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="symmlq", rtol=1e-12,
                        maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_spd_jacobi_pc(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="symmlq", rtol=1e-12, maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_indefinite(self):
        """SYMMLQ's raison d'être: symmetric INDEFINITE systems."""
        A = (laplacian_2d(6, 6) - 3.0 * sp.eye(36)).tocsr()
        Ad = aij_from_scipy(A)
        xex = np.random.default_rng(1).standard_normal(36)
        res = ksp_solve(Ad, jnp.asarray(A @ xex), ksp_type="symmlq",
                        rtol=1e-11, maxits=800)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-5)


class TestGCR:
    def test_nonsymmetric(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="gcr", rtol=1e-10, maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)

    def test_flexible_inner_ksp(self):
        """GCR is flexible: inner-KSP preconditioner is legal."""
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        pc = make_pc("ksp", A=Ad, A_host=A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gcr", rtol=1e-9)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6)

    def test_restart_window(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="gcr", restart=10,
                        rtol=1e-10, maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)


class TestBCGSL:
    def test_nonsymmetric_l2(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="bcgsl", rtol=1e-8, maxits=200)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)

    def test_ell4(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="bcgsl", bcgsl_ell=4,
                        rtol=1e-10, maxits=200)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)


class TestTrustRegionCG:
    def test_unconstrained_matches_cg(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="stcg", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_radius_constrains_step(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        unorm = float(np.linalg.norm(u))
        radius = 0.25 * unorm
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="stcg", rtol=1e-10,
                        radius=radius)
        assert int(res.reason) == ConvergedReason.CONVERGED_CG_CONSTRAINED
        np.testing.assert_allclose(float(jnp.linalg.norm(res.x)), radius,
                                   rtol=1e-10)

    def test_negative_curvature_stops_on_boundary(self):
        A = (-1.0 * sp.eye(16)).tocsr()      # negative definite
        Ad = aij_from_scipy(A)
        b = np.ones(16)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="gltr", radius=2.0,
                        rtol=1e-10)
        assert int(res.reason) == ConvergedReason.CONVERGED_CG_NEG_CURVE
        np.testing.assert_allclose(float(jnp.linalg.norm(res.x)), 2.0,
                                   rtol=1e-10)


class TestLCDTCQMR:
    def test_lcd_spd(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="lcd", rtol=1e-8, maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_lcd_nonsymmetric_with_restart(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="lcd", restart=10,
                        rtol=1e-8, maxits=800)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-5)

    def test_tcqmr_nonsymmetric(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="tcqmr", rtol=1e-8, maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)


class TestDGMRES:
    def test_deflation_beats_plain_restart(self):
        """Shifted Laplacian (small outlier eigenvalues): deflating the
        Ritz vectors at restarts must substantially cut iterations —
        the reason KSPDGMRES exists."""
        A = (laplacian_2d(12, 12) - 0.55 * sp.eye(144)).tocsr()
        Ad = aij_from_scipy(A)
        b = np.ones(144)
        g = ksp_solve(Ad, jnp.asarray(b), ksp_type="gmres", restart=15,
                      rtol=1e-8, maxits=2000)
        d = ksp_solve(Ad, jnp.asarray(b), ksp_type="dgmres", restart=15,
                      rtol=1e-8, maxits=2000)
        assert d.converged
        np.testing.assert_allclose(np.asarray(d.x), spla.spsolve(A, b),
                                   atol=1e-4)
        assert int(d.its) < 0.7 * int(g.its)

    def test_with_pc(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="dgmres", restart=10, rtol=1e-9,
                        maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6)


class TestIBCGS:
    def test_spd(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="ibcgs", rtol=1e-8, maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_nonsymmetric(self):
        A = _nonsym(8)
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="ibcgs", rtol=1e-8,
                        maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)


class TestLGMRES:
    def test_aug0_is_exactly_gmres(self):
        """With no augmentation the cycle machinery must reproduce plain
        restarted GMRES iteration-for-iteration."""
        A = _nonsym(10)
        Ad = aij_from_scipy(A)
        b = np.ones(100)
        plain = ksp_solve(Ad, jnp.asarray(b), ksp_type="gmres", restart=8,
                          rtol=1e-9, maxits=400)
        aug0 = ksp_solve(Ad, jnp.asarray(b), ksp_type="lgmres", restart=8,
                         aug_dim=0, rtol=1e-9, maxits=400)
        assert int(aug0.its) == int(plain.its)
        np.testing.assert_allclose(np.asarray(aug0.x), np.asarray(plain.x),
                                   atol=1e-12)

    def test_augmented_converges(self):
        A = _nonsym(10)
        Ad = aij_from_scipy(A)
        b = np.ones(100)
        aug = ksp_solve(Ad, jnp.asarray(b), ksp_type="lgmres", restart=10,
                        aug_dim=2, rtol=1e-10, maxits=400)
        assert aug.converged
        np.testing.assert_allclose(np.asarray(aug.x), spla.spsolve(A, b),
                                   atol=1e-6)

    def test_with_pc(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="lgmres", restart=8, rtol=1e-10, maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)


class TestEx11Complex:
    def test_ex11_1_complex_helmholtz(self):
        """output/ex11_1.out (runex11 -n 6 -norandom -pc_type none):
        complex Helmholtz −Δu − σ₁u + iσ₂u = f with σ₁=100, σ₂=10i·h²
        on the diagonal (ex11.c:104-118), u=0.5, GMRES refine_always —
        the reference's PETSC_USE_COMPLEX build capability. Monitor
        norms digit-exact: 4.62271 ... 0.154866 then happy breakdown
        <1e-11; 6 its; error <1e-12."""
        n = 6
        dim = n * n
        h2 = 1.0 / ((n + 1) * (n + 1))
        rows, cols, vals = [], [], []
        for Ii in range(dim):
            i, j = divmod(Ii, n)
            for ci, cj in ((i - 1, j), (i + 1, j), (i, j - 1),
                           (i, j + 1)):
                if 0 <= ci < n and 0 <= cj < n:
                    rows.append(Ii); cols.append(cj + n * ci)
                    vals.append(-1.0 + 0j)
            rows.append(Ii); cols.append(Ii)
            vals.append(4.0 - 100.0 * h2 + 10.0j * h2)
        A = sp.csr_matrix((vals, (rows, cols)), shape=(dim, dim),
                          dtype=np.complex128)
        u = np.full(dim, 0.5 + 0j)
        Ad = aij_from_scipy(A, dtype=np.complex128)
        r = ksp_solve(Ad, jnp.asarray(A @ u), pc=None, ksp_type="gmres",
                      rtol=1e-5, atol=1e-50, cgs_refine="always")
        golden = [4.62271, 1.58711, 0.767563, 0.472102, 0.435655,
                  0.154866]
        assert int(r.its) == 6
        np.testing.assert_allclose(np.asarray(r.history[:6]).real,
                                   golden, rtol=2e-5)
        assert float(np.abs(r.history[6])) < 1e-11
        assert np.linalg.norm(np.asarray(r.x) - u) < 1e-12


class TestComplexKrylov:
    def test_cg_bcgs_complex_hermitian(self):
        """Complex-scalar coverage beyond GMRES: CG on a Hermitian
        positive-definite complex matrix and BiCGStab on a general
        complex matrix both reach the direct solution."""
        rng = np.random.default_rng(7)
        n = 24
        M = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        H = M @ M.conj().T + n * np.eye(n)          # HPD
        Ah = aij_from_scipy(sp.csr_matrix(H), dtype=np.complex128)
        xex = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        b = H @ xex
        r = ksp_solve(Ah, jnp.asarray(b), pc=None, ksp_type="cg",
                      rtol=1e-12, maxits=300)
        assert int(r.reason) > 0
        np.testing.assert_allclose(np.asarray(r.x), xex, atol=1e-8)

        G = sp.csr_matrix(H + 0.3j * np.diag(np.arange(n)))
        Ag = aij_from_scipy(G, dtype=np.complex128)
        bg = G @ xex
        r2 = ksp_solve(Ag, jnp.asarray(bg), pc=None, ksp_type="bcgs",
                       rtol=1e-12, maxits=300)
        assert int(r2.reason) > 0
        np.testing.assert_allclose(np.asarray(r2.x), xex, atol=1e-7)
