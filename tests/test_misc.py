import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.core.random import Random
from petsctpu.mat import aij_from_scipy
from petsctpu.mat.nest import Nest, get_submatrix, make_nest
from petsctpu.models import laplacian_2d
from petsctpu.vec.indexset import IS


class TestNest:
    def test_block_mult(self):
        A = laplacian_2d(4, 4)
        B = sp.random(16, 9, density=0.3, random_state=0, format="csr")
        C = sp.random(9, 16, density=0.3, random_state=1, format="csr")
        D = (sp.eye(9) * 2.0).tocsr()
        K = sp.bmat([[A, B], [C, D]]).tocsr()
        N = make_nest([[aij_from_scipy(A), aij_from_scipy(B)],
                       [aij_from_scipy(C), aij_from_scipy(D)]])
        x = np.random.default_rng(2).standard_normal(25)
        np.testing.assert_allclose(np.asarray(N.mult(jnp.asarray(x))),
                                   K @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(N.multT(jnp.asarray(x))),
                                   K.T @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(N.diagonal()), K.diagonal())

    def test_zero_blocks(self):
        A = laplacian_2d(3, 3)
        D = (sp.eye(4) * 3.0).tocsr()
        K = sp.bmat([[A, None], [None, D]]).tocsr()
        N = make_nest([[aij_from_scipy(A), None],
                       [None, aij_from_scipy(D)]])
        x = np.arange(13.0)
        np.testing.assert_allclose(np.asarray(N.mult(jnp.asarray(x))),
                                   K @ x, rtol=1e-12)

    def test_submatrix(self):
        A = laplacian_2d(5, 5)
        rows = IS.general([0, 2, 7, 11])
        Sub = get_submatrix(A, rows)
        np.testing.assert_allclose(
            Sub.toarray(), A[np.ix_(rows.indices, rows.indices)].toarray())

    def test_nest_in_solver(self):
        from petsctpu.ksp import ksp_solve
        A = laplacian_2d(4, 4)
        D = (laplacian_2d(3, 3) + sp.eye(9)).tocsr()
        K = sp.bmat([[A, None], [None, D]]).tocsr()
        N = make_nest([[aij_from_scipy(A), None],
                       [None, aij_from_scipy(D)]])
        xex = np.random.default_rng(3).standard_normal(25)
        res = ksp_solve(N, jnp.asarray(K @ xex), ksp_type="cg", rtol=1e-11)
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-7)


class TestRandom:
    def test_interval_and_determinism(self):
        r1 = Random(seed=42, lo=-2.0, hi=3.0)
        v = np.asarray(r1.get_values((1000,)))
        assert v.min() >= -2.0 and v.max() <= 3.0
        r2 = Random(seed=42, lo=-2.0, hi=3.0)
        np.testing.assert_array_equal(v, np.asarray(r2.get_values((1000,))))
        # successive draws differ
        assert not np.array_equal(v, np.asarray(r1.get_values((1000,))))


class TestSNESVariants:
    def test_ksponly_linear_problem(self):
        from petsctpu.snes.api import snes_ksponly

        A = laplacian_2d(5, 5)
        Ad = aij_from_scipy(A)
        xex = np.ones(25)
        b = jnp.asarray(A @ xex)

        def F(x):
            return Ad.mult(x) - b

        res = snes_ksponly(F, jnp.zeros(25), jac="jvp")
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-4)

    def test_nrichardson(self):
        from petsctpu.snes.api import snes_nrichardson

        a = jnp.asarray(np.linspace(0.2, 0.6, 10))

        def F(x):
            return x - jnp.cos(x) * a      # F' = 1 + a·sin ∈ (0.4, 1.6)

        res = snes_nrichardson(F, jnp.zeros(10), rtol=1e-10, maxits=200)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-8
