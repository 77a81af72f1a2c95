"""PCASA adaptive smoothed aggregation."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat import aij_from_scipy
from petsctpu.models import laplacian_2d
from petsctpu.pc import make_pc
from petsctpu.ksp import ksp_solve


def anisotropic_laplacian(m, eps=1e-3):
    """2-D anisotropic Laplacian: -u_xx - eps*u_yy (SA stress test —
    the constant vector alone interpolates the smooth-in-x error
    badly)."""
    ex = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], (m, m))
    I = sp.eye(m)
    return (sp.kron(I, ex) + eps * sp.kron(ex, I)).tocsr()


class TestTentativeMulti:
    def test_exact_interpolation(self):
        from petsctpu.pc.asa import tentative_prolongator_multi
        rng = np.random.default_rng(0)
        n, k = 20, 2
        agg = np.repeat(np.arange(5), 4)
        B = rng.standard_normal((n, k))
        P0, Bc = tentative_prolongator_multi(agg, B)
        # SA invariant: P0 @ Bc == B (candidates in range of P0)
        np.testing.assert_allclose(P0 @ Bc, B, atol=1e-12)
        # orthonormal columns within each aggregate
        G = (P0.T @ P0).toarray()
        np.testing.assert_allclose(G, np.eye(10), atol=1e-12)

    def test_small_aggregates(self):
        from petsctpu.pc.asa import tentative_prolongator_multi
        # aggregate smaller than candidate count (rank-deficient QR)
        agg = np.array([0, 1, 1, 1])
        B = np.random.default_rng(1).standard_normal((4, 2))
        P0, Bc = tentative_prolongator_multi(agg, B)
        np.testing.assert_allclose(P0 @ Bc, B, atol=1e-12)


class TestASA:
    def test_adaptive_candidates_grow_on_anisotropy(self):
        from petsctpu.pc.asa import asa_candidates
        A = anisotropic_laplacian(24, 1e-3)
        B = asa_candidates(A, max_candidates=3, target_factor=0.1)
        assert B.shape[1] >= 2        # anisotropy forces extra candidates

    def test_asa_pc_converges(self):
        A = laplacian_2d(24, 24)
        Ad = aij_from_scipy(A, dtype=np.float64)
        pc = make_pc("asa", A=Ad, A_host=A)
        b = jnp.asarray(np.ones(A.shape[0]))
        res = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8, maxits=40)
        assert res.its < 20
        x = np.asarray(res.x)
        np.testing.assert_allclose(A @ x, 1.0, atol=1e-6)

    def test_asa_beats_plain_sa_on_anisotropy(self):
        A = anisotropic_laplacian(32, 1e-3)
        Ad = aij_from_scipy(A, dtype=np.float64)
        b = jnp.asarray(np.ones(A.shape[0]))
        pc_asa = make_pc("asa", A=Ad, A_host=A)
        pc_sa = make_pc("gamg", A=Ad, A_host=A)
        r_asa = ksp_solve(Ad, b, pc=pc_asa, ksp_type="cg", rtol=1e-8,
                          maxits=200)
        r_sa = ksp_solve(Ad, b, pc=pc_sa, ksp_type="cg", rtol=1e-8,
                         maxits=200)
        assert r_asa.its <= r_sa.its
