import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat import stencil_from_scipy, stencil_to_scipy
from petsctpu.models import laplacian_2d, poisson_3d
from petsctpu.ksp import ksp_solve
from petsctpu.pc.simple import make_jacobi


class TestStencilMat:
    def test_2d_laplacian_mult(self):
        m, n = 7, 9
        A = laplacian_2d(m, n)
        S = stencil_from_scipy(A, (m, n))
        rng = np.random.default_rng(0)
        x = rng.standard_normal(m * n)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))), A @ x,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(S.multT(jnp.asarray(x))),
                                   A.T @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(S.diagonal()), A.diagonal())

    def test_3d_poisson(self):
        A = poisson_3d(4, 5, 3)
        S = stencil_from_scipy(A, (3, 5, 4))   # natural ordering k,j,i
        x = np.random.default_rng(1).standard_normal(60)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))), A @ x,
                                   rtol=1e-12)

    def test_variable_coefficients(self):
        # nonsymmetric banded matrix with varying entries
        m, n = 6, 6
        N = m * n
        rng = np.random.default_rng(2)
        A = laplacian_2d(m, n).tolil()
        for i in range(N):
            for j in (i - n, i - 1, i, i + 1, i + n):
                if 0 <= j < N and A[i, j] != 0:
                    A[i, j] = A[i, j] * (1 + 0.3 * rng.standard_normal())
        A = A.tocsr()
        S = stencil_from_scipy(A, (m, n))
        x = rng.standard_normal(N)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))), A @ x,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(S.multT(jnp.asarray(x))),
                                   A.T @ x, rtol=1e-12)

    def test_roundtrip(self):
        A = laplacian_2d(5, 8)
        S = stencil_from_scipy(A, (5, 8))
        np.testing.assert_allclose(stencil_to_scipy(S).toarray(), A.toarray())

    def test_solve_with_stencil_operator(self):
        m = 10
        A = laplacian_2d(m, m)
        S = stencil_from_scipy(A, (m, m))
        u = np.ones(m * m)
        b = jnp.asarray(A @ u)
        res = ksp_solve(S, b, pc=make_jacobi(S), ksp_type="cg", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-8)

    def test_shift_scale(self):
        A = laplacian_2d(4, 4)
        S = stencil_from_scipy(A, (4, 4)).shift_diag(2.0).scale(0.5)
        x = np.random.default_rng(3).standard_normal(16)
        ref = 0.5 * ((A + 2.0 * sp.eye(16)) @ x)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))), ref,
                                   rtol=1e-12)
