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


class TestPeriodicBoundary:
    """DMDA_BOUNDARY_PERIODIC analog: wrapping stencils."""

    def test_periodic_matches_circulant(self):
        from petsctpu.mat.stencil import StencilMat, stencil_to_scipy
        n = 12
        C = np.stack([2.0 * np.ones(n), -np.ones(n), -np.ones(n)])
        S = StencilMat(jnp.asarray(C), ((0,), (-1,), (1,)), (n,),
                       ("periodic",))
        x = np.random.default_rng(0).standard_normal(n)
        y = np.asarray(S.mult(jnp.asarray(x)))
        import scipy.linalg as sla
        A = sla.circulant(np.r_[2.0, -1.0, np.zeros(n - 3), -1.0])
        np.testing.assert_allclose(y, A @ x, atol=1e-12)
        # multT consistency and scipy round-trip
        yT = np.asarray(S.multT(jnp.asarray(x)))
        np.testing.assert_allclose(yT, A.T @ x, atol=1e-12)
        np.testing.assert_allclose(stencil_to_scipy(S).toarray(), A,
                                   atol=1e-12)

    def test_mixed_axes_2d(self):
        from petsctpu.mat.stencil import StencilMat, stencil_to_scipy
        m, n = 5, 7
        rng = np.random.default_rng(1)
        offs = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
        C = rng.standard_normal((5, m, n))
        S = StencilMat(jnp.asarray(C), offs, (m, n), ("periodic", "none"))
        A = stencil_to_scipy(S).toarray()
        x = rng.standard_normal(m * n)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))),
                                   A @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(S.multT(jnp.asarray(x))),
                                   A.T @ x, atol=1e-12)

    def test_da_periodic_ghosts(self):
        from petsctpu.dm.da import DA
        da = DA((4, 3), boundary="periodic")
        x = jnp.arange(12.0)
        g = np.asarray(da.local_with_ghosts(x))
        xg = np.arange(12.0).reshape(4, 3)
        assert g.shape == (6, 5)
        np.testing.assert_allclose(g[0, 1:-1], xg[-1])   # wrapped row
        np.testing.assert_allclose(g[1:-1, 0], xg[:, -1])

    def test_periodic_solve(self):
        """Shifted periodic Laplacian solve matches dense (circulant
        is singular; +I makes it definite)."""
        from petsctpu.dm.da import DA
        from petsctpu.mat.stencil import stencil_to_scipy
        from petsctpu.ksp import ksp_solve
        da = DA((8, 8), boundary="periodic")
        A = da.create_matrix()
        C = np.zeros((len(A.offsets), 8, 8))
        for d, off in enumerate(A.offsets):
            C[d] = 5.0 if off == (0, 0) else -1.0
        import dataclasses
        A = dataclasses.replace(A, coeffs=jnp.asarray(C))
        b = np.random.default_rng(2).standard_normal(64)
        r = ksp_solve(A, jnp.asarray(b), ksp_type="cg", rtol=1e-12,
                      maxits=200)
        import scipy.sparse.linalg as spla
        ref = spla.spsolve(stencil_to_scipy(A).tocsc(), b)
        np.testing.assert_allclose(np.asarray(r.x), ref, atol=1e-8)
