"""SBAIJ symmetric storage, MAIJ multi-DOF wrapper, MATIS unassembled
subdomains, MatPartitioning."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat import (
    MAIJ, MatPartitioning, aij_from_scipy, edge_cut, matis_from_subdomains,
    partition_rcb, partition_rcm, sbaij_from_scipy,
)
from petsctpu.models import ex2_system, laplacian_2d


class TestSBAIJ:
    def test_mult_matches_full_bs1(self):
        A, b, u = ex2_system(6, 6)
        S = sbaij_from_scipy(A, bs=1)
        x = np.random.default_rng(0).standard_normal(36)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))),
                                   A @ x, atol=1e-12)
        assert S.nnzb < A.nnz        # storage actually halved-ish

    def test_mult_matches_full_bs2(self):
        rng = np.random.default_rng(1)
        L = laplacian_2d(4, 4)
        A = sp.kron(L, np.eye(2)) + sp.kron(sp.eye(16),
                                            np.array([[0.0, 0.3], [0.3, 0.0]]))
        A = sp.csr_matrix(A)
        S = sbaij_from_scipy(A, bs=2)
        x = rng.standard_normal(32)
        np.testing.assert_allclose(np.asarray(S.mult(jnp.asarray(x))),
                                   A @ x, atol=1e-12)

    def test_diagonal_and_rowsum(self):
        A, _, _ = ex2_system(5, 5)
        S = sbaij_from_scipy(A, bs=1)
        np.testing.assert_allclose(np.asarray(S.diagonal()), A.diagonal(),
                                   atol=1e-14)
        np.testing.assert_allclose(np.asarray(S.rows_sum()),
                                   np.asarray(A.sum(axis=1)).ravel(),
                                   atol=1e-12)

    def test_rejects_nonsymmetric(self):
        A = sp.csr_matrix(np.array([[1.0, 2.0], [0.0, 1.0]]))
        try:
            sbaij_from_scipy(A, bs=1)
            assert False, "expected symmetry error"
        except ValueError:
            pass


class TestMAIJ:
    def test_kron_identity(self):
        A, _, _ = ex2_system(4, 4)
        Ad = aij_from_scipy(A)
        M = MAIJ(Ad, dof=3)
        x = np.random.default_rng(2).standard_normal(48)
        full = sp.kron(A, sp.eye(3)).tocsr()
        np.testing.assert_allclose(np.asarray(M.mult(jnp.asarray(x))),
                                   full @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(M.multT(jnp.asarray(x))),
                                   full.T @ x, atol=1e-12)

    def test_interp_per_dof(self):
        from petsctpu.dm.da import DA, q1_interp_scipy
        da = DA((5, 5))
        coarse = da.coarsen()
        Ph = q1_interp_scipy(da.grid, coarse.grid)
        Pd = aij_from_scipy(Ph)
        M = MAIJ(Pd, dof=2)
        xc = np.random.default_rng(3).standard_normal(9 * 2)
        full = sp.kron(Ph, sp.eye(2)).tocsr()
        np.testing.assert_allclose(np.asarray(M.mult(jnp.asarray(xc))),
                                   full @ xc, atol=1e-12)


class TestMatIS:
    def test_two_subdomain_laplacian(self):
        """1-D Laplacian assembled from two overlapping Neumann pieces
        (the textbook MATIS decomposition)."""
        # global: tridiag(-1, 2, -1) on 5 points = sum of two local
        # 3-point pieces [[1,-1],[-1,2,-1],[-1,1]] sharing node 2
        loc = sp.csr_matrix(np.array([[1.0, -1.0, 0.0],
                                      [-1.0, 2.0, -1.0],
                                      [0.0, -1.0, 1.0]]))
        M = matis_from_subdomains([loc, loc], [[0, 1, 2], [2, 3, 4]], 5)
        x = np.random.default_rng(4).standard_normal(5)
        G = np.diag([1.0, 2, 2, 2, 1]) - np.diag(np.ones(4), 1) \
            - np.diag(np.ones(4), -1)
        np.testing.assert_allclose(np.asarray(M.mult(jnp.asarray(x))),
                                   G @ x, atol=1e-12)
        # host assembly matches too
        np.testing.assert_allclose(M.assemble_host().toarray(), G,
                                   atol=1e-12)

    def test_diagonal(self):
        loc = sp.csr_matrix(np.eye(2) * 3.0)
        M = matis_from_subdomains([loc, loc], [[0, 1], [1, 2]], 3)
        np.testing.assert_allclose(np.asarray(M.diagonal()), [3.0, 6.0, 3.0])


class TestNestedDissection:
    def test_nd_beats_rcm_fill(self):
        """Real nested dissection: LU fill below RCM (and far below
        natural) on a 2-D Laplacian — the gennd.c property."""
        from scipy.sparse.linalg import splu
        from petsctpu.mat.order import get_ordering
        A = laplacian_2d(24, 24).tocsc()

        def fill(kind):
            perm = get_ordering(A, kind)
            assert sorted(perm) == list(range(576))
            Ap = sp.csc_matrix(A[perm][:, perm])
            lu = splu(Ap, permc_spec="NATURAL", diag_pivot_thresh=0.0,
                      options=dict(SymmetricMode=True))
            return lu.L.nnz + lu.U.nnz

        f_nat, f_rcm, f_nd = fill("natural"), fill("rcm"), fill("nd")
        assert f_nd < f_rcm < f_nat


class TestPartitioning:
    def test_rcm_balanced(self):
        """On a SCRAMBLED numbering (where naive contiguous splits are
        terrible) RCM-band bisection recovers a low cut."""
        rng = np.random.default_rng(5)
        perm = rng.permutation(144)
        A = laplacian_2d(12, 12).tocsr()[perm][:, perm]
        part = partition_rcm(A, 4)
        counts = np.bincount(part)
        assert len(counts) == 4 and counts.min() == counts.max() == 36
        naive = np.repeat(np.arange(4), 36)
        assert edge_cut(A, part) < 0.5 * edge_cut(A, naive)

    def test_rcb_geometric(self):
        xs, ys = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        coords = np.stack([xs.ravel(), ys.ravel()], axis=1)
        part = partition_rcb(coords, 4)
        counts = np.bincount(part)
        assert counts.min() == counts.max() == 16
        # quadrant split: all members of a part share a compact box
        for p in range(4):
            c = coords[part == p]
            assert (c.max(axis=0) - c.min(axis=0)).max() <= 4

    def test_interface_object(self):
        A = laplacian_2d(6, 6)
        mp = MatPartitioning().set_adjacency(A).set_n_parts(3)
        part = mp.apply()
        assert mp.counts(part).sum() == 36
