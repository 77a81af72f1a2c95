import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat import (
    AIJ, aij_from_scipy, aij_to_scipy, baij_from_scipy_bsr, Dense,
    Shell, Transpose, Normal, ShiftScale, Composite, LRC, Diagonal,
    ell_from_coo,
)
from petsctpu.models import laplacian_2d


def random_csr(m, n, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng, format="csr")
    A.data = rng.standard_normal(A.nnz)
    return A


class TestAIJ:
    def test_mult_matches_scipy(self):
        A = random_csr(40, 40)
        Ad = aij_from_scipy(A)
        x = np.random.default_rng(1).standard_normal(40)
        np.testing.assert_allclose(np.asarray(Ad.mult(jnp.asarray(x))), A @ x,
                                   rtol=1e-12)

    def test_rectangular_and_multT(self):
        A = random_csr(30, 50)
        Ad = aij_from_scipy(A)
        x = np.random.default_rng(2).standard_normal(50)
        y = np.random.default_rng(3).standard_normal(30)
        np.testing.assert_allclose(np.asarray(Ad.mult(jnp.asarray(x))), A @ x, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Ad.multT(jnp.asarray(y))), A.T @ y, rtol=1e-12)

    def test_diagonal(self):
        A = laplacian_2d(5, 5)
        Ad = aij_from_scipy(A)
        np.testing.assert_allclose(np.asarray(Ad.diagonal()), A.diagonal())

    def test_roundtrip(self):
        A = laplacian_2d(4, 6)
        np.testing.assert_allclose(aij_to_scipy(aij_from_scipy(A)).toarray(),
                                   A.toarray())

    def test_shift_diag(self):
        A = laplacian_2d(4, 4)
        Ad = aij_from_scipy(A).shift_diag(2.5)
        np.testing.assert_allclose(np.asarray(Ad.diagonal()), A.diagonal() + 2.5)

    def test_mult_dense(self):
        A = random_csr(20, 20)
        Ad = aij_from_scipy(A)
        X = np.random.default_rng(4).standard_normal((20, 3))
        np.testing.assert_allclose(np.asarray(Ad.mult_dense(jnp.asarray(X))),
                                   A @ X, rtol=1e-12)

    def test_jit_pytree(self):
        A = aij_from_scipy(laplacian_2d(5, 5))
        f = jax.jit(lambda M, v: M.mult(v))
        x = jnp.ones(25)
        np.testing.assert_allclose(np.asarray(f(A, x)),
                                   np.asarray(A.mult(x)))


class TestCOOAssembly:
    def test_matches_scipy_with_duplicates(self):
        rng = np.random.default_rng(5)
        nnz, m, n = 200, 15, 12
        r = rng.integers(0, m, nnz)
        c = rng.integers(0, n, nnz)
        v = rng.standard_normal(nnz)
        ref = sp.coo_matrix((v, (r, c)), shape=(m, n)).toarray()
        Ad = ell_from_coo(jnp.asarray(r), jnp.asarray(c), jnp.asarray(v),
                          (m, n), ell_width=n)
        got = np.zeros((m, n))
        cols = np.asarray(Ad.cols)
        vals = np.asarray(Ad.vals)
        for i in range(m):
            for k in range(cols.shape[1]):
                got[i, cols[i, k]] += vals[i, k]
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    def test_negative_rows_dropped(self):
        r = jnp.array([0, -1, 1, 5])
        c = jnp.array([0, 0, 1, 0])
        v = jnp.array([1.0, 9.0, 2.0, 9.0])
        Ad = ell_from_coo(r, c, v, (3, 3), ell_width=3)
        x = jnp.ones(3)
        np.testing.assert_allclose(np.asarray(Ad.mult(x)), [1.0, 2.0, 0.0])

    def test_mult_equivalence(self):
        A = laplacian_2d(6, 6).tocoo()
        Ad = ell_from_coo(jnp.asarray(A.row), jnp.asarray(A.col),
                          jnp.asarray(A.data), A.shape, ell_width=5)
        x = np.random.default_rng(6).standard_normal(36)
        np.testing.assert_allclose(np.asarray(Ad.mult(jnp.asarray(x))),
                                   A @ x, rtol=1e-12)


class TestBAIJ:
    def test_blocked_mult(self):
        bs = 3
        A = sp.kron(laplacian_2d(4, 4), np.eye(bs)) + sp.kron(
            sp.eye(16), np.arange(bs * bs).reshape(bs, bs) * 0.1)
        Ab = baij_from_scipy_bsr(A.tocsr(), bs=bs)
        x = np.random.default_rng(7).standard_normal(16 * bs)
        np.testing.assert_allclose(np.asarray(Ab.mult(jnp.asarray(x))), A @ x,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Ab.multT(jnp.asarray(x))), A.T @ x,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Ab.diagonal()), A.diagonal(),
                                   rtol=1e-12)


class TestWrappers:
    def setup_method(self):
        self.A = random_csr(12, 12, density=0.4, seed=8)
        self.Ad = aij_from_scipy(self.A)
        self.x = jnp.asarray(np.random.default_rng(9).standard_normal(12))

    def test_transpose(self):
        T = Transpose(self.Ad)
        np.testing.assert_allclose(np.asarray(T.mult(self.x)),
                                   self.A.T @ np.asarray(self.x), rtol=1e-12)

    def test_normal(self):
        N = Normal(self.Ad)
        np.testing.assert_allclose(np.asarray(N.mult(self.x)),
                                   self.A.T @ (self.A @ np.asarray(self.x)),
                                   rtol=1e-12)

    def test_shiftscale(self):
        S = ShiftScale(self.Ad, 2.0, -1.5)
        ref = 2.0 * (self.A @ np.asarray(self.x)) - 1.5 * np.asarray(self.x)
        np.testing.assert_allclose(np.asarray(S.mult(self.x)), ref, rtol=1e-12)

    def test_composite(self):
        C = Composite((self.Ad, Diagonal(jnp.full(12, 3.0))), mode="additive")
        ref = self.A @ np.asarray(self.x) + 3.0 * np.asarray(self.x)
        np.testing.assert_allclose(np.asarray(C.mult(self.x)), ref, rtol=1e-12)

    def test_lrc(self):
        rng = np.random.default_rng(10)
        U = rng.standard_normal((12, 2))
        C = rng.standard_normal((2, 2))
        V = rng.standard_normal((12, 2))
        L = LRC(self.Ad, jnp.asarray(U), jnp.asarray(C), jnp.asarray(V))
        ref = self.A @ np.asarray(self.x) + U @ (C @ (V.T @ np.asarray(self.x)))
        np.testing.assert_allclose(np.asarray(L.mult(self.x)), ref, rtol=1e-12)

    def test_shell(self):
        S = Shell(ctx=self.Ad, mult_fn=lambda ctx, v: ctx.mult(v) * 2.0,
                  shape=(12, 12))
        np.testing.assert_allclose(np.asarray(S.mult(self.x)),
                                   2.0 * (self.A @ np.asarray(self.x)), rtol=1e-12)

    def test_dense(self):
        M = np.random.default_rng(11).standard_normal((8, 8))
        D = Dense(jnp.asarray(M))
        v = jnp.asarray(np.arange(8.0))
        np.testing.assert_allclose(np.asarray(D.mult(v)), M @ np.arange(8.0),
                                   rtol=1e-12)
