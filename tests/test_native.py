import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu import native
from petsctpu.models import laplacian_2d


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable (no g++)")


@needs_native
class TestNativeKernels:
    def test_ilu0_matches_python(self):
        """Native numeric ILU(0) == pure-python reference (forced)."""
        A = laplacian_2d(8, 8).tocsr()
        A.sort_indices()
        n = A.shape[0]
        M = A.toarray().copy()          # snapshot BEFORE in-place factor
        patt = A.toarray() != 0
        av = A.data.astype(np.float64).copy()
        native.ilu0_csr_inplace(A.indptr, A.indices, av)
        # naive dense ILU(0)
        for i in range(1, n):
            for k in range(i):
                if patt[i, k]:
                    M[i, k] /= M[k, k]
                    for j in range(k + 1, n):
                        if patt[i, j]:
                            M[i, j] -= M[i, k] * M[k, j]
        F = sp.csr_matrix((av, A.indices, A.indptr), shape=A.shape).toarray()
        np.testing.assert_allclose(F, np.where(patt, M, 0), atol=1e-12)

    def test_tri_levels(self):
        L = sp.tril(laplacian_2d(4, 4), k=-1).tocsr()
        lev = native.tri_levels(L.indptr, L.indices, True)
        # lower-tri: level[i] = 1 + max(level[deps]); spot-check wavefronts
        assert lev[0] == 0
        ai, aj = L.indptr, L.indices
        for i in range(L.shape[0]):
            deps = aj[ai[i]:ai[i + 1]]
            expect = (lev[deps].max() + 1) if len(deps) else 0
            assert lev[i] == expect, i

    def test_coloring_valid(self):
        A = laplacian_2d(7, 9).tocsr()
        csc = A.tocsc()
        color = native.greedy_color(
            A.indptr.astype(np.int64), A.indices.astype(np.int32),
            csc.indptr.astype(np.int64), csc.indices.astype(np.int32),
            A.shape[0], A.shape[1])
        # validity: columns sharing a row have different colors
        for r in range(A.shape[0]):
            cols = A.indices[A.indptr[r]:A.indptr[r + 1]]
            assert len(set(color[cols])) == len(cols), r
        assert color.max() + 1 <= 9   # stencil-bounded

    def test_aggregate_covers(self):
        S = ((laplacian_2d(10, 10) != 0).astype(np.int8)
             - sp.eye(100, dtype=np.int8)).tocsr()
        agg = native.aggregate(S.indptr.astype(np.int64),
                               S.indices.astype(np.int32))
        assert np.all(agg >= 0)
        assert 0 < agg.max() + 1 < 100

    def test_rcm_reduces_bandwidth(self):
        from petsctpu.mat.order import bandwidth, get_ordering, \
            permute_symmetric
        rng = np.random.default_rng(0)
        perm0 = rng.permutation(64)
        A = laplacian_2d(8, 8)[perm0][:, perm0].tocsr()   # scrambled
        p = get_ordering(A, "rcm")
        assert sorted(p) == list(range(64))
        assert bandwidth(permute_symmetric(A, p)) < bandwidth(A)

    def test_rcm_ilu_ordering_pc(self):
        import jax.numpy as jnp
        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc
        from petsctpu.models import ex2_system

        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A, options=Options(
            {"pc_factor_mat_ordering_type": "rcm"}))
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                        rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)


class TestNativeFactorKernels:
    """Round-2 native kernels must be BIT-identical to the pure-Python
    implementations (goldens pin ICC/ILU(k) digit-exact behavior)."""

    def _mats(self):
        import scipy.sparse as sp

        from petsctpu.models import laplacian_2d, poisson_3d
        rng = np.random.default_rng(7)
        A1 = laplacian_2d(13, 11)
        A2 = poisson_3d(6, 5, 7)
        # an indefinite-ish perturbed operator to exercise the shifts
        A3 = A1 + sp.diags(0.5 * rng.standard_normal(A1.shape[0]))
        return [sp.csr_matrix(M) for M in (A1, A2, A3)]

    def test_iluk_pattern_matches_python(self, monkeypatch):
        import petsctpu.native as native
        from petsctpu.pc.factor import _iluk_pattern
        for A in self._mats():
            for k in (0, 1, 2, 3):
                got = _iluk_pattern(A, k)
                monkeypatch.setattr(native, "available", lambda: False)
                ref = _iluk_pattern(A, k)
                monkeypatch.undo()
                assert len(got) == len(ref)
                for g, r in zip(got, ref):
                    np.testing.assert_array_equal(g, r)

    def test_icck_pattern_matches_python(self, monkeypatch):
        import petsctpu.native as native
        from petsctpu.mat.factor import icc_pattern
        for A in self._mats():
            for k in (0, 1, 2):
                got = icc_pattern(A, k)
                monkeypatch.setattr(native, "available", lambda: False)
                ref = icc_pattern(A, k)
                monkeypatch.undo()
                for g, r in zip(got, ref):
                    np.testing.assert_array_equal(g, r)

    def test_icc_numeric_matches_python(self, monkeypatch):
        import petsctpu.native as native
        from petsctpu.mat.factor import icc_factor, icc_pattern
        for A in self._mats():
            for shift in ("positive_definite", "nonzero", "inblocks"):
                patt = icc_pattern(A, 1)
                full = [np.concatenate([[i], p])
                        for i, p in enumerate(patt)]
                got = icc_factor(A, full, shift_type=shift)
                monkeypatch.setattr(native, "available", lambda: False)
                ref = icc_factor(A, full, shift_type=shift)
                monkeypatch.undo()
                np.testing.assert_array_equal(got[0].toarray(),
                                              ref[0].toarray())
                np.testing.assert_array_equal(got[1], ref[1])
                assert got[2] == ref[2] and got[3] == ref[3]
