import jax.numpy as jnp
import numpy as np

from petsctpu.dm import DA
from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
from petsctpu.snes.variants import snes_anderson, snes_newtontr, snes_qn


def quad(n=15, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(1.0, 3.0, n))

    def F(x):
        return x * x - a

    return F, jnp.sqrt(a)


class TestNewtonTR:
    def test_quadratic(self):
        F, xstar = quad()
        res = snes_newtontr(F, jnp.ones(15) * 2.0, rtol=1e-10, maxits=60)
        assert res.converged, int(res.reason)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar),
                                   atol=1e-7)

    def test_bratu(self):
        da = DA((13, 13))
        F = bratu_residual(da, 5.0)
        res = snes_newtontr(F, bratu_initial_guess(da, 5.0), rtol=1e-9,
                            maxits=60, delta0=1.0)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-7

    def test_hard_start_where_newton_fails(self):
        """arctan from far away: plain Newton diverges, TR converges."""
        def F(x):
            return jnp.arctan(x)

        res = snes_newtontr(F, jnp.asarray([10.0]), rtol=1e-10, maxits=80)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), [0.0], atol=1e-8)


class TestAnderson:
    def test_linear_fixed_point(self):
        rng = np.random.default_rng(1)
        M = rng.standard_normal((12, 12))
        M = 0.3 * M / np.abs(np.linalg.eigvals(M)).max()
        b = rng.standard_normal(12)

        def F(x):
            return x - (jnp.asarray(M) @ x + jnp.asarray(b))

        res = snes_anderson(F, jnp.zeros(12), rtol=1e-10, maxits=100)
        assert res.converged
        xref = np.linalg.solve(np.eye(12) - M, b)
        np.testing.assert_allclose(np.asarray(res.x), xref, atol=1e-7)

    def test_accelerates_picard(self):
        """Anderson should beat damped Richardson on the same problem
        (AA stagnates near machine-level without restarts, so compare
        at a moderate tolerance)."""
        from petsctpu.snes.api import snes_nrichardson

        da = DA((9, 9))
        F = bratu_residual(da, 4.0)
        x0 = bratu_initial_guess(da, 4.0)
        ra = snes_anderson(F, x0, window=6, beta=0.5, rtol=1e-4, maxits=300)
        assert ra.converged, int(ra.reason)
        rr = snes_nrichardson(F, x0, damping=0.8, rtol=1e-4, maxits=300)
        assert rr.converged
        assert int(ra.its) < int(rr.its)


class TestQN:
    def test_quadratic(self):
        F, xstar = quad()
        res = snes_qn(F, jnp.ones(15) * 2.0, rtol=1e-10, maxits=100)
        assert res.converged, int(res.reason)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar),
                                   atol=1e-7)

    def test_bratu(self):
        da = DA((9, 9))
        F = bratu_residual(da, 4.0)
        res = snes_qn(F, bratu_initial_guess(da, 4.0), rtol=1e-8,
                      maxits=200, history_len=15)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-6


class TestNewtonNPC:
    """Nonlinear right-preconditioning on Newton-LS (ls.c:199-211)."""

    def test_ngs_preconditioned_newton(self):
        from petsctpu.dm import DA
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.mat.coloring import stencil_coloring
        from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
        from petsctpu.snes import snes_solve
        from petsctpu.snes.fas import ngs_sweep

        da = DA((17, 17))
        F = bratu_residual(da, lam=6.0)
        x0 = bratu_initial_guess(da, 6.0)
        colors = jnp.asarray(stencil_coloring(da.grid, da.stencil_offsets()))
        nc = int(colors.max()) + 1

        def ngs(x):
            return ngs_sweep(F, x, None, colors, nc)
        r_plain = snes_solve(F, x0, jac="jvp", rtol=1e-9,
                             ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-6,
                                               maxits=300))
        r_npc = snes_solve(F, x0, jac="jvp", rtol=1e-9, npc=ngs,
                           ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-6,
                                             maxits=300))
        assert r_npc.converged
        assert int(r_npc.its) <= int(r_plain.its)
        assert float(np.linalg.norm(np.asarray(F(r_npc.x)))) < 1e-8


class TestPBratu:
    def test_ex15_1_pbratu_newton(self):
        """snes ex15 (p-Bratu, output/ex15_1.out: -p 1.3 -lambda 1,
        20×20, NEWTON): iteration-count parity (17 Newton its,
        CONVERGED_FNORM_RELATIVE), first norms 0.690597/0.437398
        digit-exact, the full bt-damped history to ~3 digits (the
        reference run's inner 2-rank BJacobi linear solves at rtol
        1e-5 perturb the later inexact-Newton path slightly)."""
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.models import pbratu_initial_guess, pbratu_residual
        from petsctpu.snes import snes_solve

        F = pbratu_residual(20, 20, p=1.3, lam=1.0)
        x0 = pbratu_initial_guess(20, 20, lam=1.0)
        r = snes_solve(F, x0, jac="jvp", rtol=1e-8, atol=1e-50,
                       maxits=50,
                       ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                         maxits=500, restart=60))
        golden = [0.690597, 0.437398, 0.309414, 0.132346, 0.0919326,
                  0.0752673, 0.0669231, 0.0592614, 0.0516656,
                  0.0441557, 0.0367679, 0.0288573, 0.0277441,
                  0.00855032, 0.00140821, 7.34059e-05, 3.61999e-07]
        assert int(r.its) == 17
        assert r.converged
        np.testing.assert_allclose(np.asarray(r.history[:2]),
                                   golden[:2], rtol=2e-5)
        np.testing.assert_allclose(np.asarray(r.history[:17]), golden,
                                   rtol=2e-2)


class TestEx5NGMRESPreconditioned:
    """snes ex5 NGMRES with nonlinear preconditioners (makefile:344
    CSD_BASIC_COMMAND_LINE: 81x81 Bratu, lambda=6) — goldens verified
    current against a hand-built oracle of the reference tree."""

    def _setup(self):
        from petsctpu.dm import DA
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        da = DA((81, 81))
        return da, bratu_residual(da, 6.0), bratu_initial_guess(da, 6.0)

    def test_ex5_5_ngmres_ngs(self):
        """output/ex5_5_ngmres_ngs.out: -snes_type ngmres
        -npc_snes_type gs -npc_snes_max_it 1 — NGMRES right-
        preconditioned by ONE sweep of ex5.c's user NonlinearGS
        (sequential pointwise Newton, SNESSetGS hook)."""
        from petsctpu.models.bratu import bratu_nonlinear_gs
        from petsctpu.snes.variants import snes_ngmres
        da, F, x0 = self._setup()
        gs = bratu_nonlinear_gs(da, 6.0)
        r = snes_ngmres(F, x0, msize=30, maxits=12, rtol=1e-12,
                        npc=lambda X: gs(X))
        golden = [1.11127, 0.565096, 0.384346, 0.292364, 0.235438,
                  0.196743, 0.168319, 0.146367, 0.128902, 0.114647,
                  0.102763, 0.0926959, 0.0840538]
        np.testing.assert_allclose(np.asarray(r.history[:13]), golden,
                                   rtol=2e-5)

    def test_ex5_5_ngmres_richardson(self):
        """output/ex5_5_ngmres_richardson.out: -snes_type ngmres
        -snes_ngmres_m 10 -npc_snes_type nrichardson
        -npc_snes_max_it 3 — NGMRES(10) right-preconditioned by three
        L2-line-search Richardson iterations."""
        from petsctpu.snes.api import snes_nrichardson
        from petsctpu.snes.variants import snes_ngmres
        da, F, x0 = self._setup()
        npc = lambda X: snes_nrichardson(F, X, maxits=3, rtol=1e-12,
                                         atol=1e-50).x
        r = snes_ngmres(F, x0, msize=10, maxits=12, rtol=1e-12, npc=npc)
        golden = [1.11127, 0.457705, 0.298339, 0.211765, 0.16522,
                  0.131514, 0.107927, 0.0911397, 0.0768304, 0.0660328,
                  0.0570803, 0.0494061, 0.0432223]
        np.testing.assert_allclose(np.asarray(r.history[:13]), golden,
                                   rtol=2e-5)
