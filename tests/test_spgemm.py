import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.dm import q1_interp_scipy
from petsctpu.mat import aij_to_scipy
from petsctpu.mat.spgemm import (PtAPPlan, SpGEMMPlan, csr_data_of,
                                 matmatmult, ptap, rart)
from petsctpu.models import laplacian_2d


def rand_pattern_values(M, seed):
    """Same pattern, fresh values."""
    rng = np.random.default_rng(seed)
    M = sp.csr_matrix(M, copy=True)
    M.data = rng.standard_normal(M.nnz)
    return M


class TestHostProducts:
    def test_matmatmult(self):
        A = laplacian_2d(5, 5)
        B = laplacian_2d(5, 5)
        np.testing.assert_allclose(matmatmult(A, B).toarray(),
                                   (A @ B).toarray())

    def test_ptap_rart(self):
        A = laplacian_2d(9, 9)
        P = q1_interp_scipy((9, 9), (5, 5))
        np.testing.assert_allclose(ptap(A, P).toarray(),
                                   (P.T @ A @ P).toarray())
        np.testing.assert_allclose(rart(A, P.T).toarray(),
                                   (P.T @ A @ P).toarray())


class TestDevicePlans:
    def test_spgemm_numeric(self):
        A0 = laplacian_2d(6, 6)
        B0 = laplacian_2d(6, 6)
        plan = SpGEMMPlan.plan(A0, B0)
        # change values, keep pattern
        A1 = rand_pattern_values(A0, 1)
        B1 = rand_pattern_values(B0, 2)
        C = plan.numeric(jnp.asarray(csr_data_of(A1)),
                         jnp.asarray(csr_data_of(B1)))
        ref = (A1 @ B1).toarray()
        np.testing.assert_allclose(aij_to_scipy(C).toarray(), ref,
                                   atol=1e-12)

    def test_ptap_numeric_galerkin(self):
        A0 = laplacian_2d(9, 9)
        P = q1_interp_scipy((9, 9), (5, 5))
        plan = PtAPPlan.plan(A0, P)
        A1 = rand_pattern_values(A0, 3)
        # symmetrize so it's a legit Galerkin test
        A1 = ((A1 + A1.T) / 2).tocsr()
        # pattern may have merged — restrict to original pattern data
        A1 = sp.csr_matrix((A1[A0.nonzero()].A1
                            if hasattr(A1[A0.nonzero()], "A1")
                            else np.asarray(A1[A0.nonzero()]).ravel(),
                            A0.nonzero()), shape=A0.shape)
        Ac = plan.numeric(jnp.asarray(csr_data_of(A1)))
        ref = (P.T @ A1 @ P).toarray()
        np.testing.assert_allclose(aij_to_scipy(Ac).toarray(), ref,
                                   atol=1e-12)

    def test_numeric_in_jit_loop(self):
        """The point of the split: re-coarsen inside jit as values change."""
        import jax

        A0 = laplacian_2d(9, 9)
        P = q1_interp_scipy((9, 9), (5, 5))
        plan = PtAPPlan.plan(A0, P)
        a0 = jnp.asarray(csr_data_of(A0))

        @jax.jit
        def coarse_diag_sum(scale):
            Ac = plan.numeric(a0 * scale)
            return jnp.sum(Ac.diagonal())

        s1 = float(coarse_diag_sum(1.0))
        s2 = float(coarse_diag_sum(2.0))
        np.testing.assert_allclose(s2, 2 * s1, rtol=1e-12)
        ref = (P.T @ A0 @ P).diagonal().sum()
        np.testing.assert_allclose(s1, ref, rtol=1e-12)
