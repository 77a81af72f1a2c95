"""Multilevel k-way graph partitioning (mat/partition + native kway).

Reference: MatPartitioning with ParMetis
(src/mat/partition/impls/pmetis/pmetis.c) — multilevel k-way is the
reference's default quality partitioner; rcm strip partitioning (the
round-1/2 default here) degrades on non-bandable graphs.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.mat.partition import (MatPartitioning, _kway_python,
                                    edge_cut, partition_kway,
                                    partition_rcm)
from petsctpu.models import laplacian_2d


def lap3d(m):
    e = np.ones(m)
    T = sp.diags([e[:-1], -2 * e, e[:-1]], [-1, 0, 1])
    I = sp.eye(m)
    return (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
            + sp.kron(sp.kron(I, I), T)).tocsr()


class TestKwayPartition:
    def test_beats_rcm_on_3d(self):
        A = lap3d(20)
        pk = partition_kway(A, 8)
        pr = partition_rcm(A, 8)
        ck, cr = edge_cut(A, pk), edge_cut(A, pr)
        assert ck < 0.6 * cr, (ck, cr)
        bal = np.bincount(pk, minlength=8)
        assert bal.max() <= 1.05 * A.shape[0] / 8

    def test_permutation_invariant_quality(self):
        """Scrambled grid: quality must come from the GRAPH, not the
        index order (the failure mode of contiguous splits)."""
        A = laplacian_2d(64, 64).tocsr()
        rng = np.random.default_rng(0)
        p = rng.permutation(A.shape[0])
        As = A[p][:, p].tocsr()
        c0 = edge_cut(A, partition_kway(A, 8))
        cs = edge_cut(As, partition_kway(As, 8))
        # within 2x of each other and both far below random (~7/8 cut)
        assert cs < 2.0 * c0 and c0 < 2.0 * cs
        assert cs < 0.1 * As.nnz / 2

    def test_quality_vs_metis_reference(self):
        """2-D 128x128 grid, k=8: METIS gets ~600-660; require within
        2x (the VERDICT done-criterion)."""
        A = laplacian_2d(128, 128)
        cut = edge_cut(A, partition_kway(A, 8))
        assert cut <= 2 * 660, cut

    def test_deterministic(self):
        A = lap3d(12)
        p1 = partition_kway(A, 4, seed=7)
        p2 = partition_kway(A, 4, seed=7)
        np.testing.assert_array_equal(p1, p2)

    def test_hub_graph_stays_balanced(self):
        """Star-heavy graph: matching weight cap + forced-balance moves
        must keep parts within tolerance."""
        n = 4000
        rng = np.random.default_rng(1)
        src = np.arange(1, n)
        dst = rng.integers(0, np.maximum(src, 1))
        A = sp.coo_matrix((np.ones(n - 1), (src, dst)), shape=(n, n))
        A = ((A + A.T) != 0).astype(np.int64).tocsr()
        part = partition_kway(A, 8)
        bal = np.bincount(part, minlength=8)
        assert bal.min() >= 0.5 * n / 8 and bal.max() <= 1.2 * n / 8, bal

    def test_python_fallback_same_contract(self):
        A = laplacian_2d(32, 32).tocsr()
        P = (A != 0).astype(np.int64)
        P = ((P + P.T) != 0).astype(np.int64).tocsr()
        P.setdiag(0)
        P.eliminate_zeros()
        part = _kway_python(P, 4, seed=0)
        bal = np.bincount(part, minlength=4)
        assert bal.min() > 0 and edge_cut(P, part) < P.nnz / 2

    def test_matpartitioning_interface(self):
        A = laplacian_2d(48, 48)
        mp = MatPartitioning().set_adjacency(A).set_n_parts(4) \
            .set_type("kway")
        part = mp.apply()
        assert mp.counts(part).sum() == A.shape[0]
        assert edge_cut(A, part) < edge_cut(A, partition_rcm(A, 4)) * 1.2


class TestKwayShardedSolve:
    def test_halo_volume_reduction_and_solve(self):
        """sharded_aij with perm='kway' on a scrambled operator: the
        halo plan shrinks vs the naive contiguous split, and the
        distributed CG solve still returns the correct solution
        (un-permuted)."""
        import jax
        from jax.sharding import Mesh
        from petsctpu.parallel import (par_ksp_solve,
                                       sharded_aij_from_scipy,
                                       unshard_vector)

        n_dev = min(8, len(jax.devices()))
        if n_dev < 2:
            pytest.skip("needs >=2 devices")
        m = 40
        A = laplacian_2d(m, m, dtype=np.float64).tocsr()
        A = A + sp.eye(m * m) * 0.1
        rng = np.random.default_rng(3)
        p = rng.permutation(m * m)
        As = A[p][:, p].tocsr()
        u = rng.standard_normal(m * m)
        b = As @ u

        A_naive, part_naive = sharded_aij_from_scipy(As, n_dev,
                                                     dtype=np.float64)
        A_kway, part_kway = sharded_aij_from_scipy(As, n_dev,
                                                   dtype=np.float64,
                                                   perm="kway")
        assert part_kway.halo.gmax < part_naive.halo.gmax, (
            part_kway.halo.gmax, part_naive.halo.gmax)

        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("rows",))
        perm = part_kway.perm
        r = par_ksp_solve(mesh, A_kway, b[perm], ksp_type="cg",
                          rtol=1e-10, maxits=2000)
        assert int(r.reason) > 0
        x = unshard_vector(r.x, part_kway.layout)
        x_unperm = np.empty_like(x)
        x_unperm[perm] = x
        np.testing.assert_allclose(x_unperm, u, rtol=1e-6, atol=1e-7)
