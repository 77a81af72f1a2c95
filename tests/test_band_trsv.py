"""Banded (MXU-tiled) triangular solves — the fast MatSolve path."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.mat.factor import ilu0, make_band_trsv_plan
from petsctpu.models import ex2_system
from petsctpu.pc import make_pc
from petsctpu.pc.factor import make_ilu


class TestBandTRSV:
    def test_matches_dense_solve(self):
        A, b, u = ex2_system(14, 14)
        L, U = ilu0(A)
        x = np.random.default_rng(0).standard_normal(196)
        for Tm, lower, unit in ((L, True, True), (U, False, False)):
            plan = make_band_trsv_plan(Tm, lower=lower, unit_diag=unit)
            y = np.asarray(jax.jit(lambda p, v: p.solve(v))(
                plan, jnp.asarray(x)))
            Td = Tm.toarray()
            if unit:
                np.fill_diagonal(Td, 1.0)
            np.testing.assert_allclose(y, np.linalg.solve(Td, x), atol=1e-12)

    def test_ilu_band_equals_level(self):
        A, b, u = ex2_system(12, 12)
        p_level = make_ilu(A)
        p_band = make_ilu(A, tri="band")
        y1 = np.asarray(p_level.apply(jnp.asarray(b)))
        y2 = np.asarray(p_band.apply(jnp.asarray(b)))
        np.testing.assert_allclose(y1, y2, atol=1e-12)

    def test_solve_same_iterations(self):
        """GMRES+ILU(band) reproduces GMRES+ILU(level) exactly."""
        A, b, u = ex2_system(10, 10)
        Ad = aij_from_scipy(A)
        r1 = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("ilu", A=Ad, A_host=A),
                       ksp_type="gmres", rtol=1e-10)
        r2 = ksp_solve(Ad, jnp.asarray(b),
                       pc=make_pc("ilu", A=Ad, A_host=A, options=Options(
                           {"pc_factor_tri_solve": "band"})),
                       ksp_type="gmres", rtol=1e-10)
        assert int(r1.its) == int(r2.its)
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                                   atol=1e-10)

    def test_odd_size_uneven_tiles(self):
        A, b, u = ex2_system(13, 11)          # n = 143, not tile-aligned
        p_band = make_ilu(A, tri="band")
        p_level = make_ilu(A)
        y1 = np.asarray(p_level.apply(jnp.asarray(b)))
        y2 = np.asarray(p_band.apply(jnp.asarray(b)))
        np.testing.assert_allclose(y1, y2, atol=1e-12)


class TestHierBandTRSV:
    """Two-phase blocked band solve (BandTRSVHierPlan): exact vs scipy
    for lower/upper, non-divisible tile counts, both dtypes."""

    def _mk(self, n, bw, seed=0):
        rng = np.random.default_rng(seed)
        L = sp.diags([rng.standard_normal(n - k) * 0.3 for k in range(bw)],
                     [-k for k in range(bw)]).tolil()
        L.setdiag(np.abs(L.diagonal()) + 2.0)
        return sp.csr_matrix(L)

    def test_lower_upper_exact(self):
        from petsctpu.mat.factor import make_band_trsv_hier_plan
        for n, bw, tile in [(50, 7, 16), (300, 25, 64), (777, 40, 128)]:
            Lm = self._mk(n, bw)
            b = np.random.default_rng(1).standard_normal(n)
            pl = make_band_trsv_hier_plan(Lm, lower=True, unit_diag=False,
                                          tile=tile)
            np.testing.assert_allclose(
                np.asarray(pl.solve(jnp.asarray(b))),
                spla.spsolve_triangular(Lm, b, lower=True), atol=1e-10)
            U = Lm.T.tocsr()
            pu = make_band_trsv_hier_plan(U, lower=False, unit_diag=False,
                                          tile=tile)
            np.testing.assert_allclose(
                np.asarray(pu.solve(jnp.asarray(b))),
                spla.spsolve_triangular(U, b, lower=False), atol=1e-10)

    def test_matches_flat_band_plan(self):
        from petsctpu.mat.factor import (make_band_trsv_hier_plan,
                                         make_band_trsv_plan)
        from petsctpu.models import laplacian_2d
        from petsctpu.mat.factor import ilu0
        A = laplacian_2d(20, 20)
        L, U = ilu0(A)
        b = np.random.default_rng(2).standard_normal(400)
        flat = make_band_trsv_plan(L, lower=True, unit_diag=True, tile=64)
        hier = make_band_trsv_hier_plan(L, lower=True, unit_diag=True,
                                        tile=64)
        np.testing.assert_allclose(np.asarray(hier.solve(jnp.asarray(b))),
                                   np.asarray(flat.solve(jnp.asarray(b))),
                                   atol=1e-12)

    def test_ilu_band2_pc(self):
        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import laplacian_2d
        from petsctpu.pc import make_pc
        A = laplacian_2d(16, 16)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A,
                     options=Options({"pc_factor_tri_solve": "band2"}))
        b = jnp.asarray(np.ones(256))
        r = ksp_solve(Ad, b, pc=pc, ksp_type="gmres", rtol=1e-8, maxits=60)
        assert r.converged
        np.testing.assert_allclose(A @ np.asarray(r.x), 1.0, atol=1e-6)
