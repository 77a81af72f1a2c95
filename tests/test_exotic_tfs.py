"""PCExotic (wirebasket/face) and PCTFS (XXT)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.dm.da import DA
from petsctpu.ksp.api import ksp_solve
from petsctpu.ksp.common import KSPConfig
from petsctpu.mat.ell import aij_from_scipy
from petsctpu.pc.exotic import exotic_interpolation, make_exotic, make_tfs


def lap3d(m):
    """7-point Laplacian on an m^3 grid via the DA stencil pattern."""
    n = m * m * m
    idx = np.arange(n).reshape(m, m, m)
    rows, cols, vals = [], [], []
    rows.append(idx.ravel()); cols.append(idx.ravel())
    vals.append(np.full(n, 6.0))
    for ax in range(3):
        lo = np.take(idx, np.arange(m - 1), axis=ax).ravel()
        hi = np.take(idx, np.arange(1, m), axis=ax).ravel()
        rows += [lo, hi]
        cols += [hi, lo]
        vals += [np.full(lo.size, -1.0)] * 2
    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    return A


class TestExotic:
    def test_interpolation_reproduces_constants(self):
        # wb.c's debug check: with exact local solves each P row sums
        # to 1 (surface indicators tile the boundary, interiors are
        # exact harmonic extensions of the constant)
        m = 8
        A = lap3d(m)
        # make interior rows exactly harmonic (zero row sums) so the
        # constant check is exact: add Neumann-like closure
        for etype, ncols in (("wirebasket", 26), ("face", 6)):
            P = exotic_interpolation(A, (m, m, m), (2, 2, 2), etype)
            assert P.shape == (m ** 3, 8 * ncols)
            # interior rows of the grid (not touching the global
            # boundary): the 7-pt stencil there has zero row sum, so
            # the harmonic extension preserves the constant
            idx = np.arange(m ** 3).reshape(m, m, m)
            inner = idx[1:-1, 1:-1, 1:-1].ravel()
            rs = np.asarray(P.sum(axis=1)).ravel()
            np.testing.assert_allclose(rs[inner], 1.0, atol=1e-10)

    @pytest.mark.parametrize("etype", ["wirebasket", "face"])
    def test_accelerates_cg(self, etype):
        m = 12
        A = lap3d(m)
        Ad = aij_from_scipy(A, dtype=np.float64)
        b = jnp.asarray(np.random.default_rng(3).standard_normal(m ** 3))
        cfg = KSPConfig(ksp_type="cg", rtol=1e-8, maxits=400)
        pc = make_exotic(A, (m, m, m), (2, 2, 2), etype=etype,
                         dtype=np.float64)
        r_pc = ksp_solve(Ad, b, pc=pc, cfg=cfg)
        r_none = ksp_solve(Ad, b, cfg=cfg)
        assert int(r_pc.its) < int(r_none.its) / 2, (
            etype, int(r_pc.its), int(r_none.its))
        x = np.asarray(r_pc.x)
        np.testing.assert_allclose(A @ x, np.asarray(b), atol=1e-6)


class TestTFS:
    def test_exact_inverse(self):
        m = 6
        A = lap3d(m)
        pc = make_tfs(A, dtype=np.float64)
        rng = np.random.default_rng(0)
        b = rng.standard_normal(m ** 3)
        x = np.asarray(pc.apply(jnp.asarray(b)))
        np.testing.assert_allclose(A @ x, b, atol=1e-9)

    def test_preonly_direct_solve(self):
        m = 6
        A = lap3d(m)
        Ad = aij_from_scipy(A, dtype=np.float64)
        pc = make_tfs(A, dtype=np.float64)
        b = jnp.asarray(np.random.default_rng(1).standard_normal(m ** 3))
        r = ksp_solve(Ad, b, pc=pc,
                      cfg=KSPConfig(ksp_type="preonly", maxits=1))
        np.testing.assert_allclose(A @ np.asarray(r.x), np.asarray(b),
                                   atol=1e-8)

    def test_drop_tolerance_still_preconditioner(self):
        m = 6
        A = lap3d(m)
        Ad = aij_from_scipy(A, dtype=np.float64)
        pc = make_tfs(A, dtype=np.float64, drop_tol=1e-3)
        b = jnp.asarray(np.random.default_rng(2).standard_normal(m ** 3))
        r = ksp_solve(Ad, b, pc=pc,
                      cfg=KSPConfig(ksp_type="cg", rtol=1e-8, maxits=50))
        assert int(r.its) < 15
        np.testing.assert_allclose(A @ np.asarray(r.x), np.asarray(b),
                                   atol=1e-6)

    def test_make_pc_dispatch(self):
        from petsctpu.core.options import Options
        from petsctpu.pc.api import make_pc
        m = 6
        A = lap3d(m)
        Ad = aij_from_scipy(A, dtype=np.float64)
        pc = make_pc("tfs", A=Ad, A_host=A)
        pc2 = make_pc("wb", A=Ad, A_host=A, options=Options(
            {"pc_exotic_grid": (m, m, m)}))
        b = jnp.ones(m ** 3)
        assert np.isfinite(float(jnp.linalg.norm(pc.apply(b))))
        assert np.isfinite(float(jnp.linalg.norm(pc2.apply(b))))
