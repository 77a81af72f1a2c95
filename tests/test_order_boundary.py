"""1WD ordering (gen1wd.c) + DMDA MIRROR/GHOSTED boundary types
(petscdmda.h:51) — VERDICT r2 item 8 parity mop-ups."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.dm.da import DA
from petsctpu.mat.order import gen1wd, get_ordering
from petsctpu.models import laplacian_2d


class TestGen1WD:
    def test_is_permutation_and_deterministic(self):
        A = laplacian_2d(20, 20)
        p1 = get_ordering(A, "1wd")
        p2 = get_ordering(A, "1wd")
        assert sorted(p1.tolist()) == list(range(400))
        np.testing.assert_array_equal(p1, p2)

    def test_small_component_whole(self):
        """Components under 50 nodes are returned whole (fn1wd.c's
        early exit), so the ordering is one reversed level structure."""
        A = sp.diags([np.ones(19), np.ones(19)], [-1, 1],
                     shape=(20, 20)).tocsr()
        p = gen1wd(((A + A.T) != 0).astype(np.int8).tocsr())
        assert sorted(p.tolist()) == list(range(20))

    def test_dissectors_reduce_profile(self):
        """On a long 2-D strip the 1WD blocks produce a narrower
        envelope than natural order for a block solver; sanity: the
        dissector count is small relative to n."""
        A = laplacian_2d(8, 120)
        S = ((sp.csr_matrix(A) != 0).astype(np.int8)).tocsr()
        p = gen1wd(S)
        assert sorted(p.tolist()) == list(range(8 * 120))
        # factor fill with 1wd should not explode vs rcm (both banded
        # here); crude check via splu on permuted matrix
        from scipy.sparse.linalg import splu
        Ap = sp.csr_matrix(A)[p][:, p].tocsc() + sp.eye(960).tocsc()
        lu = splu(Ap, permc_spec="NATURAL")
        fill = lu.L.nnz + lu.U.nnz
        assert fill < 40 * 960, fill

    def test_solve_through_ordering(self):
        """ILU through the 1wd ordering solves correctly (the
        -pc_factor_mat_ordering_type 1wd path, ex10.script)."""
        from petsctpu.mat import aij_from_scipy
        from petsctpu.ksp import ksp_solve
        from petsctpu.pc.factor import make_ilu

        A = (laplacian_2d(12, 12) + sp.eye(144) * 0.3).tocsr()
        Ad = aij_from_scipy(A, dtype=np.float64)
        pc = make_ilu(A, levels=1, ordering="1wd")
        rng = np.random.default_rng(0)
        xex = rng.standard_normal(144)
        r = ksp_solve(Ad, jnp.asarray(A @ xex), pc=pc,
                      ksp_type="gmres", rtol=1e-10, maxits=100)
        assert int(r.reason) > 0
        np.testing.assert_allclose(np.asarray(r.x), xex, atol=1e-8)


class TestDABoundaries:
    def test_mirror_ghosts(self):
        da = DA((5,), boundary="mirror")
        x = jnp.arange(5.0)
        g = np.asarray(da.local_with_ghosts(x))
        np.testing.assert_array_equal(g, [1, 0, 1, 2, 3, 4, 3])

    def test_ghosted_fill(self):
        da = DA((4,), boundary="ghosted")
        g = np.asarray(da.local_with_ghosts(jnp.arange(4.0), fill=7.0))
        np.testing.assert_array_equal(g, [7, 0, 1, 2, 3, 7])

    def test_mirror_operator_is_neumann(self):
        """-u'' with MIRROR boundary == the homogeneous-Neumann
        operator (row 0: 2u0 - 2u1)."""
        from petsctpu.mat.stencil import StencilMat
        m = 6
        C = np.zeros((3, m))
        C[0] = 2.0
        C[1] = -1.0   # (-1,)
        C[2] = -1.0   # (+1,)
        M = StencilMat(jnp.asarray(C), ((0,), (-1,), (1,)), (m,),
                       ("mirror",))
        D = np.array([np.asarray(M.mult(jnp.eye(m)[i])) for i in
                      range(m)]).T
        ref = sp.diags([-np.ones(m - 1), 2 * np.ones(m),
                        -np.ones(m - 1)], [-1, 0, 1]).toarray()
        ref[0, 1] = -2.0
        ref[-1, -2] = -2.0
        np.testing.assert_allclose(D, ref)
        # constant vector is in the null space (pure Neumann)
        np.testing.assert_allclose(
            np.asarray(M.mult(jnp.ones(m))), 0.0, atol=1e-14)

    def test_mirror_2d_mixed(self):
        """Mixed (mirror, periodic) 2-D: row sums vanish (both
        boundary types conserve the constant)."""
        from petsctpu.mat.stencil import StencilMat
        m = 5
        C = np.zeros((5, m, m))
        C[0] = 4.0
        C[1:] = -1.0
        M = StencilMat(jnp.asarray(C),
                       ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
                       (m, m), ("mirror", "periodic"))
        np.testing.assert_allclose(
            np.asarray(M.mult(jnp.ones(m * m))), 0.0, atol=1e-14)

    def test_mirror_multt_guarded(self):
        from petsctpu.mat.stencil import StencilMat
        M = StencilMat(jnp.zeros((1, 4)), ((0,),), (4,), ("mirror",))
        with pytest.raises(NotImplementedError):
            M.multT(jnp.ones(4))
