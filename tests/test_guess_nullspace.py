"""KSPFischerGuess and MatNullSpace removal."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.ksp.api import KSP
from petsctpu.mat import aij_from_scipy
from petsctpu.mat.nullspace import make_nullspace
from petsctpu.models import laplacian_2d


def neumann_laplacian_1d(n):
    """Singular pure-Neumann Laplacian: null space = constants."""
    d = 2.0 * np.ones(n)
    d[0] = d[-1] = 1.0
    return sp.diags([-np.ones(n - 1), d, -np.ones(n - 1)],
                    [-1, 0, 1]).tocsr()


class TestNullSpace:
    def test_singular_neumann_cg(self):
        n = 50
        A = neumann_laplacian_1d(n)
        Ad = aij_from_scipy(A)
        nsp = make_nullspace(n, has_constant=True)
        assert nsp.test(Ad)
        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)
        b -= b.mean()                      # consistent RHS
        r = ksp_solve(Ad, jnp.asarray(b), ksp_type="cg", rtol=1e-10,
                      maxits=300, nullspace=nsp)
        x = np.asarray(r.x)
        np.testing.assert_allclose(A @ x, b, atol=1e-8)
        assert abs(x.mean()) < 1e-10       # pinned to range(A)

    def test_user_vector_nullspace(self):
        # A = L ⊗ diag(mask): null space spanned by a given vector
        n = 20
        v = np.zeros(n)
        v[3] = 1.0
        A = sp.diags(np.r_[np.arange(1.0, 4), 0.0,
                           np.arange(5.0, n + 1)]).tocsr()
        nsp = make_nullspace(n, has_constant=False, vecs=[v])
        Ad = aij_from_scipy(A)
        assert nsp.test(Ad)
        b = np.ones(n)
        b[3] = 0.0                          # consistent
        r = ksp_solve(Ad, jnp.asarray(b), ksp_type="gmres", rtol=1e-12,
                      maxits=60, nullspace=nsp)
        x = np.asarray(r.x)
        np.testing.assert_allclose(A @ x, b, atol=1e-8)
        assert abs(x[3]) < 1e-10

    def test_orthonormalization_dedup(self):
        nsp = make_nullspace(10, has_constant=True,
                             vecs=[np.ones(10), np.arange(10.0)])
        # the constant direction is removed from user vectors
        assert nsp.vecs.shape[0] == 1


class TestFischerGuess:
    def test_sequence_iterations_drop(self):
        A = laplacian_2d(16, 16)
        Ad = aij_from_scipy(A)
        n = A.shape[0]
        # atol-driven stopping: rtol is relative to the INITIAL residual
        # (KSPDefaultConverged), which a good guess shrinks — absolute
        # tolerance is how sequences with guesses are stopped in practice
        ksp = KSP(Options({"ksp_type": "cg", "ksp_rtol": 1e-14,
                           "ksp_atol": 1e-6, "ksp_max_it": 400,
                           "pc_type": "jacobi"}))
        ksp.set_operators(Ad, A)
        ksp.set_use_fischer_guess(model=1, size=8)
        # slowly rotating RHS family (time-stepping pattern)
        xs = np.linspace(0, 1, n)
        its = []
        for k in range(6):
            t = 0.05 * k
            b = np.sin(2 * np.pi * (xs + t)) + 0.5
            res = ksp.solve(jnp.asarray(b))
            its.append(int(res.its))
            x = np.asarray(res.x)
            np.testing.assert_allclose(A @ x, b, atol=1e-5)
        # once the subspace is populated, solves start much closer
        assert min(its[2:]) < its[0]

    def test_exact_repeat_is_near_free(self):
        A = laplacian_2d(10, 10)
        Ad = aij_from_scipy(A)
        ksp = KSP(Options({"ksp_type": "gmres", "ksp_rtol": 1e-14,
                           "ksp_atol": 1e-8, "pc_type": "jacobi",
                           "ksp_max_it": 300}))
        ksp.set_operators(Ad, A)
        ksp.set_use_fischer_guess(model=2, size=4)
        b = jnp.asarray(np.random.default_rng(1).standard_normal(100))
        r1 = ksp.solve(b)
        r2 = ksp.solve(b)                  # same RHS: guess ≈ solution
        assert int(r2.its) <= 2
        assert int(r1.its) > 5
