import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.core.errors import SNESConvergedReason
from petsctpu.dm import DA
from petsctpu.ksp.common import KSPConfig
from petsctpu.models.bratu import (bratu_initial_guess, bratu_jacobian_template,
                                   bratu_residual)
from petsctpu.pc.simple import JacobiPC
from petsctpu.snes import ColoredJacobian, SNES, SNESConfig, snes_solve


def quad_system(n=20, seed=0):
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(1.0, 4.0, n))

    def F(x):
        return x * x - a

    return F, jnp.sqrt(a)


class TestNewton:
    def test_quadratic_convergence_jvp(self):
        F, xstar = quad_system()
        res = snes_solve(F, jnp.ones_like(xstar), jac="jvp", rtol=1e-12)
        assert res.converged
        assert int(res.its) <= 8
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar),
                                   atol=1e-10)
        # quadratic convergence: residual drops superlinearly at the end
        h = np.asarray(res.history[: int(res.its) + 1])
        assert h[-1] < 1e-3 * h[-2]

    def test_mffd(self):
        F, xstar = quad_system()
        res = snes_solve(F, jnp.ones_like(xstar), jac="fd", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(xstar),
                                   atol=1e-8)

    def test_bratu_jvp(self):
        da = DA((17, 17))
        F = bratu_residual(da, lam=6.0)
        x0 = bratu_initial_guess(da, 6.0)
        res = snes_solve(F, x0, jac="jvp", rtol=1e-10,
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-6,
                                           maxits=300))
        assert res.converged, int(res.reason)
        fin = np.linalg.norm(np.asarray(F(res.x)))
        assert fin < 1e-9
        assert int(res.its) <= 10

    def test_bratu_colored_matches_jvp(self):
        da = DA((13, 13))
        F = bratu_residual(da, lam=5.0)
        x0 = bratu_initial_guess(da, 5.0)
        plan = ColoredJacobian.from_stencil(bratu_jacobian_template(da))
        assert plan.ncolors <= 9
        pcb = lambda J: JacobiPC(1.0 / J.diagonal())
        r1 = snes_solve(F, x0, jac=plan, pc_builder=pcb, rtol=1e-10)
        r2 = snes_solve(F, x0, jac="jvp", rtol=1e-10)
        assert r1.converged and r2.converged
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                                   atol=1e-8)

    def test_colored_jacobian_values(self):
        """FD-colored Jacobian ≈ AD Jacobian entries."""
        da = DA((7, 7))
        F = bratu_residual(da, lam=4.0)
        x = bratu_initial_guess(da, 4.0)
        plan = ColoredJacobian.from_stencil(bratu_jacobian_template(da))
        Jc = plan.assemble(F, x, F(x))
        Jdense = jax.jacfwd(F)(x)
        from petsctpu.mat.stencil import stencil_to_scipy
        np.testing.assert_allclose(stencil_to_scipy(Jc).toarray(),
                                   np.asarray(Jdense), atol=1e-6)

    def test_linesearch_needed(self):
        """A start where full Newton overshoots: bt still converges."""
        def F(x):
            return jnp.arctan(x)

        x0 = jnp.asarray([10.0])      # full Newton diverges for |x|>~1.39
        res_bt = snes_solve(F, x0, jac="jvp", linesearch="bt", rtol=1e-10)
        assert res_bt.converged
        np.testing.assert_allclose(np.asarray(res_bt.x), [0.0], atol=1e-8)
        res_basic = snes_solve(F, x0, jac="jvp", linesearch="basic",
                               maxits=20, rtol=1e-10)
        assert not res_basic.converged

    def test_snes_object_options(self):
        from petsctpu.core.options import Options
        da = DA((9, 9))
        F = bratu_residual(da, lam=5.0)
        snes = SNES(options=Options({"snes_rtol": "1e-9",
                                     "ksp_type": "gmres"}))
        snes.set_function(F)
        res = snes.solve(bratu_initial_guess(da, 5.0))
        assert res.converged
        assert np.linalg.norm(np.asarray(F(res.x))) < 1e-8

    def test_max_it_reason(self):
        F, xstar = quad_system()
        res = snes_solve(F, jnp.ones_like(xstar) * 100.0, jac="jvp",
                         maxits=2, rtol=1e-14)
        assert int(res.reason) == SNESConvergedReason.DIVERGED_MAX_IT


class TestLineSearchOrders:
    def test_bt_cubic_and_quadratic(self):
        """-snes_linesearch_order cubic|quadratic (linesearchbt.c):
        both models converge on a problem whose full Newton step
        overshoots (exp-based residual forces backtracking)."""
        import jax.numpy as jnp

        from petsctpu.snes.api import SNESConfig, snes_solve

        def F(x):
            return jnp.exp(x) - jnp.asarray([2.0, 3.0, 5.0])

        x0 = jnp.asarray([5.0, 5.0, 5.0])
        for order in ("cubic", "quadratic"):
            r = snes_solve(F, x0, jac="jvp",
                           cfg=SNESConfig(rtol=1e-10, ls_order=order))
            assert r.converged, order
            np.testing.assert_allclose(np.asarray(jnp.exp(r.x)),
                                       [2.0, 3.0, 5.0], rtol=1e-8)


class TestGridSequence:
    def test_ex5_2_style_grid_sequencing(self):
        """-snes_grid_sequence (the runex5_2 mechanism): Bratu λ=6
        from 17² refined 3×: the interpolated initial guess makes
        each finer solve take no more Newton its than cold-started,
        and the finest solve needs only 1-3 its."""
        from petsctpu.dm import DA
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        from petsctpu.snes.api import snes_grid_sequence

        da = DA((17, 17))
        kcfg = KSPConfig(ksp_type="cg", rtol=1e-5, maxits=3000)
        seq = snes_grid_sequence(
            da, lambda d: bratu_residual(d, 6.0), 3,
            bratu_initial_guess(da, 6.0), jac="jvp", rtol=1e-8,
            ksp_cfg=kcfg)
        assert len(seq) == 4
        assert all(r.converged for r in seq)
        assert int(seq[-1].its) <= 3           # warm-started finest
        # cold-started finest solve for comparison
        fine = DA((129, 129))
        cold = snes_solve(bratu_residual(fine, 6.0),
                          bratu_initial_guess(fine, 6.0), jac="jvp",
                          rtol=1e-8, ksp_cfg=kcfg)
        assert int(seq[-1].its) <= int(cold.its)


class TestSNESTypeDispatch:
    def test_snes_type_option_selects_solver(self):
        """-snes_type on the options-driven SNES object dispatches to
        every registered nonlinear solver family (SNESSetType /
        SNESSetFromOptions analog) and all converge on the 9×9 Bratu."""
        from petsctpu.core.options import Options
        from petsctpu.dm import DA
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)

        da = DA((9, 9))
        F = bratu_residual(da, 6.0)
        x0 = bratu_initial_guess(da, 6.0)
        expected_max = {"newtonls": 5, "newtontr": 6, "ksponly": 1,
                        "qn": 30, "ngmres": 30, "ncg": 60,
                        "nrichardson": 400}
        for t, cap in expected_max.items():
            s = SNES(Options({"snes_type": t, "snes_max_it": 400,
                              "snes_rtol": 1e-6}))
            s.set_function(F)
            r = s.solve(x0)
            assert r.converged, t
            assert int(r.its) <= cap, (t, int(r.its))
