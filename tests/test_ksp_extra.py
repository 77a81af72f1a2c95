import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.pc import make_pc


class TestExtraKSP:
    def setup_method(self):
        self.A, self.b, self.u = ex2_system(8, 8)
        self.Ad = aij_from_scipy(self.A)
        self.pc = make_pc("jacobi", A=self.Ad)

    def test_cr(self):
        res = ksp_solve(self.Ad, jnp.asarray(self.b), pc=self.pc,
                        ksp_type="cr", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), self.u, atol=1e-7)

    def test_cr_indefinite_symmetric(self):
        A = (laplacian_2d(6, 6) - 3.0 * sp.eye(36)).tocsr()
        Ad = aij_from_scipy(A)
        xex = np.random.default_rng(0).standard_normal(36)
        res = ksp_solve(Ad, jnp.asarray(A @ xex), ksp_type="cr", rtol=1e-10,
                        maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-6)

    def test_tfqmr_nonsymmetric(self):
        A = laplacian_2d(8, 8).tolil()
        for i in range(63):
            A[i, i + 1] += 0.4
        A = A.tocsr()
        Ad = aij_from_scipy(A)
        b = np.ones(64)
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="tfqmr", rtol=1e-10, maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), spla.spsolve(A, b),
                                   atol=1e-6)

    def test_cgne_rectangular_normal(self):
        res = ksp_solve(self.Ad, jnp.asarray(self.b), pc=None,
                        ksp_type="cgne", rtol=1e-12, maxits=2000)
        np.testing.assert_allclose(np.asarray(res.x), self.u, atol=1e-5)

    def test_fbcgs(self):
        res = ksp_solve(self.Ad, jnp.asarray(self.b), pc=self.pc,
                        ksp_type="fbcgs", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), self.u, atol=1e-7)

    def test_fbcgs_with_variable_pc(self):
        """Flexible method tolerates a nonlinear PC (inner KSP)."""
        pc = make_pc("ksp", A=self.Ad, A_host=self.A)
        res = ksp_solve(self.Ad, jnp.asarray(self.b), pc=pc,
                        ksp_type="fbcgs", rtol=1e-9)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), self.u, atol=1e-6)
