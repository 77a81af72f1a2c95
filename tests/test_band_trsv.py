"""Banded (MXU-tiled) triangular solves — the fast MatSolve path."""

import jax
import jax.numpy as jnp
import numpy as np

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
