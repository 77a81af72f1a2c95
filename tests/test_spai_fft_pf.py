"""SPAI PC, FFT Mat / fast Poisson solver, PF pointwise functions."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat import aij_from_scipy
from petsctpu.models import laplacian_2d
from petsctpu.pc import make_pc
from petsctpu.ksp import ksp_solve


class TestSPAI:
    def test_approximates_inverse_small(self):
        # diagonally dominant: SPAI on pattern(A) should be a decent M≈A⁻¹
        rng = np.random.default_rng(3)
        n = 30
        A = sp.random(n, n, density=0.15, random_state=rng).tocsr()
        A = A + sp.eye(n) * (np.abs(A).sum(axis=1).max() + 1.0)
        from petsctpu.pc.spai import spai_host
        M = spai_host(A)
        # Frobenius residual must beat the Jacobi (diagonal) guess
        I = np.eye(n)
        r_spai = np.linalg.norm(A @ M.toarray() - I)
        r_jac = np.linalg.norm(A.toarray() @ np.diag(1.0 / A.diagonal()) - I)
        assert r_spai < 0.6 * r_jac

    def test_spai_accelerates_gmres(self):
        A = laplacian_2d(12, 12)
        Ad = aij_from_scipy(A)
        b = jnp.asarray(np.ones(A.shape[0], np.float64))
        res_none = ksp_solve(Ad, b, ksp_type="gmres", rtol=1e-8, maxits=200)
        pc = make_pc("spai", A=Ad, A_host=A)
        res_spai = ksp_solve(Ad, b, pc=pc, ksp_type="gmres", rtol=1e-8,
                             maxits=200)
        assert res_spai.its < res_none.its
        x = np.asarray(res_spai.x)
        np.testing.assert_allclose(A @ x, np.ones(A.shape[0]), atol=1e-6)

    def test_pattern_power_improves(self):
        A = laplacian_2d(10, 10)
        from petsctpu.pc.spai import spai_host
        I = np.eye(A.shape[0])
        r1 = np.linalg.norm(A @ spai_host(A, 1).toarray() - I)
        r2 = np.linalg.norm(A @ spai_host(A, 2).toarray() - I)
        assert r2 < r1


class TestFFT:
    def test_fftmat_matches_dense_dft(self):
        from petsctpu.mat.fft import FFTMat
        n = 8
        F = FFTMat((n,))
        x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        y = np.asarray(F.mult(jnp.asarray(x)))
        np.testing.assert_allclose(y, np.fft.fft(x), atol=1e-4)
        xb = np.asarray(F.solve(jnp.asarray(y)))
        np.testing.assert_allclose(xb.real, x, atol=1e-5)

    def test_dst1_self_inverse(self):
        from petsctpu.mat.fft import dst1
        x = jnp.asarray(np.random.default_rng(1).standard_normal(9)
                        .astype(np.float64))
        y = dst1(dst1(x))
        np.testing.assert_allclose(np.asarray(y),
                                   (10 / 2.0) * np.asarray(x), rtol=1e-12)

    def test_poisson_fft_exact_solve_2d(self):
        from petsctpu.mat.fft import make_poisson_fft
        m = 12
        A = laplacian_2d(m, m)
        pc = make_poisson_fft((m, m), dtype=np.float64)
        b = np.random.default_rng(2).standard_normal(m * m)
        x = np.asarray(pc.apply(jnp.asarray(b)))
        np.testing.assert_allclose(A @ x, b, atol=1e-10)

    def test_poisson_fft_as_pc_one_iteration(self):
        m = 16
        A = laplacian_2d(m, m)
        Ad = aij_from_scipy(A, dtype=np.float64)
        from petsctpu.core.options import Options
        pc = make_pc("fft", A=Ad, A_host=A,
                     options=Options({"pc_fft_dims": (m, m)}))
        b = jnp.asarray(np.ones(m * m))
        res = ksp_solve(Ad, b, pc=pc, ksp_type="gmres", rtol=1e-10, maxits=5)
        assert res.its <= 2          # exact PC: richardson/gmres in 1-2


class TestPF:
    def test_identity_constant_quick(self):
        from petsctpu.vec.pf import make_pf
        x = jnp.asarray([1.0, -2.0, 3.0])
        assert np.allclose(np.asarray(make_pf("identity")(x)), [1, -2, 3])
        assert np.allclose(np.asarray(make_pf("constant", value=7.0)(x)), 7.0)
        sq = make_pf("quick", fn=lambda v: v * v)
        assert np.allclose(np.asarray(sq(x)), [1, 4, 9])

    def test_string(self):
        from petsctpu.vec.pf import make_pf
        f = make_pf("string", expr="sin(x) + exp(-abs(x))")
        x = np.linspace(-1, 1, 11)
        np.testing.assert_allclose(np.asarray(f(jnp.asarray(x))),
                                   np.sin(x) + np.exp(-np.abs(x)),
                                   rtol=1e-6)

    def test_string_rejects_unknown_names(self):
        from petsctpu.vec.pf import make_pf
        import pytest
        with pytest.raises(ValueError):
            make_pf("string", expr="__import__('os')")

    def test_registry(self):
        from petsctpu.vec.pf import make_pf, register_pf, PF
        register_pf("double", lambda: PF(lambda v: 2 * v, "double"))
        x = jnp.asarray([1.0, 2.0])
        assert np.allclose(np.asarray(make_pf("double")(x)), [2, 4])
