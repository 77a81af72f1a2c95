"""FAS nonlinear multigrid, colored NGS, NCG, and NPC-NGMRES tests on
the Bratu problem (reference SNES ex5 / FAS tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.dm.da import DA
from petsctpu.mat.coloring import stencil_coloring
from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
from petsctpu.snes import (
    fas_levels_from_da, ngs_sweep, snes_fas, snes_ncg, snes_ngs, snes_solve,
)
from petsctpu.snes.variants import snes_anderson


def _bratu(n=17, lam=6.0):
    da = DA((n, n))
    return da, bratu_residual(da, lam), bratu_initial_guess(da, lam)


class TestNGS:
    def test_converges_bratu(self):
        da, F, x0 = _bratu(9)
        colors = stencil_coloring(da.grid, da.stencil_offsets())
        res = snes_ngs(F, x0, colors, rtol=1e-8, maxits=500)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-6

    def test_sweep_reduces_residual(self):
        da, F, x0 = _bratu(9)
        colors = jnp.asarray(stencil_coloring(da.grid, da.stencil_offsets()))
        x1 = ngs_sweep(F, x0, None, colors, int(colors.max()) + 1)
        assert float(jnp.linalg.norm(F(x1))) < float(jnp.linalg.norm(F(x0)))


class TestFAS:
    def test_three_level_bratu(self):
        da, F, x0 = _bratu(17)
        levels = fas_levels_from_da(da, lambda d: bratu_residual(d, 6.0), 3)
        res = snes_fas(levels, x0, rtol=1e-8, maxits=30)
        assert res.converged
        # matches the Newton solution
        newton = snes_solve(F, x0, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(newton.x),
                                   atol=1e-6)

    def test_mesh_independent_cycles(self):
        """FAS signature property: V-cycle count roughly independent of
        grid size (the reference's reason for SNESFAS to exist)."""
        its = {}
        for n in (17, 33):
            da = DA((n, n))
            levels = fas_levels_from_da(da,
                                        lambda d: bratu_residual(d, 6.0), 3)
            res = snes_fas(levels, bratu_initial_guess(da, 6.0),
                           rtol=1e-8, maxits=40)
            assert res.converged, n
            its[n] = int(res.its)
        assert its[33] <= its[17] + 4

    def test_jit_wrappable(self):
        da, F, x0 = _bratu(17)
        levels = fas_levels_from_da(da, lambda d: bratu_residual(d, 6.0), 2)
        fn = jax.jit(lambda x: snes_fas(levels, x, rtol=1e-8, maxits=30).x)
        x = fn(x0)
        assert float(jnp.linalg.norm(F(x))) < 1e-6


class TestNCG:
    def test_bratu(self):
        da, F, x0 = _bratu(9)
        res = snes_ncg(F, x0, rtol=1e-6, maxits=2000)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-4

    def test_fr_variant(self):
        da, F, x0 = _bratu(9)
        res = snes_ncg(F, x0, beta_type="fr", rtol=1e-6, maxits=3000)
        assert float(res.fnorm) < 1e-3


class TestNPC:
    def test_ngmres_with_ngs_npc(self):
        """NGMRES right-preconditioned by NGS sweeps (the reference's
        -npc_snes_type gs composition)."""
        da, F, x0 = _bratu(17)
        colors = jnp.asarray(stencil_coloring(da.grid, da.stencil_offsets()))
        nc = int(colors.max()) + 1

        def npc(x):
            return ngs_sweep(F, x, None, colors, nc, omega=0.9)

        plain = snes_anderson(F, x0, rtol=1e-8, maxits=300)
        acc = snes_anderson(F, x0, npc=npc, rtol=1e-8, maxits=300)
        assert acc.converged
        assert int(acc.its) < int(plain.its)
