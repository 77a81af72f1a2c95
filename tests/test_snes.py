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


class TestEx28Multiphysics:
    """snes ex28: 1-D multiphysics prototype — a PDE (staggered
    variable-coefficient Poisson for u) coupled to a pointwise
    ALGEBRAIC system for k on a DMComposite [u(20); k(19)] packing.
    Serial streams minted from the reference-source oracle for all
    three -problem_type runs; Newton = assembled exact Jacobian
    (jacfwd onto the analytic sparsity) + ILU(0)/GMRES(rtol 1e-5)
    inner + bt-cubic line search — digit-exact."""

    MU, MK = 20, 19

    def _residuals(self):
        mu, mk = self.MU, self.MK
        hu, hk = 1.0 / mu, 1.0 / mk

        def Fu(u, k):
            f = jnp.zeros(mu)
            f = f.at[0].set(u[0] / hu)
            f = f.at[-1].set((u[-1] - 1.0) / hu)
            i = jnp.arange(1, mu - 1)
            f = f.at[i].set(hu * ((k[i - 1] * (u[i] - u[i - 1])
                                   - k[i] * (u[i + 1] - u[i])) / hu ** 2
                                  - 1.0))
            return f

        def Fk(u, k):
            ubar = 0.5 * (u[1:] + u[:-1])
            gradu = (u[1:] - u[:-1]) / hk
            g = 1.0 + gradu * gradu
            w = 1.0 / (1.0 + ubar) + 1.0 / g
            return hk * (jnp.exp(k - 1.0) + k - 1.0 / w)

        return Fu, Fk

    def _initial(self):
        mu, mk = self.MU, self.MK
        hk = 1.0 / mk
        u0 = np.arange(mu) * hk * (1.0 - np.arange(mu) * hk)
        k0 = 1.0 + 0.5 * np.sin(2 * np.pi * np.arange(mk) * hk)
        return u0, k0

    def _pattern(self, ptype):
        import scipy.sparse as sp
        mu, mk = self.MU, self.MK
        if ptype == 0:
            rows, cols = [0, mu - 1], [0, mu - 1]
            for i in range(1, mu - 1):
                rows += [i] * 3
                cols += [i - 1, i, i + 1]
            return sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                                 shape=(mu, mu))
        if ptype == 1:
            return sp.eye(mk, format="csr")
        rows, cols = [0, mu - 1], [0, mu - 1]
        for i in range(1, mu - 1):
            rows += [i] * 5
            cols += [i - 1, i, i + 1, mu + i - 1, mu + i]
        for i in range(mk):
            rows += [mu + i] * 3
            cols += [mu + i, i, i + 1]
        n = mu + mk
        return sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                             shape=(n, n))

    def _newton(self, F, x0, patt, golden, final_small, rtol=2e-5):
        import scipy.sparse as sp

        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.factor import make_ilu
        from petsctpu.snes.api import SNESConfig, _linesearch_bt
        from petsctpu.vec import ops

        x = jnp.asarray(x0)
        cfg = SNESConfig(linesearch="bt")
        jacf = jax.jacfwd(F)
        P = sp.csr_matrix(patt)
        for it in range(len(golden)):
            Fx = F(x)
            fnorm = float(jnp.linalg.norm(Fx))
            np.testing.assert_allclose(fnorm, golden[it], rtol=rtol,
                                       err_msg=f"iteration {it}")
            J = np.asarray(jacf(x))
            Jh = sp.csr_matrix((J[P.nonzero()], P.nonzero()),
                               shape=P.shape)
            rk = ksp_solve(aij_from_scipy(Jh), Fx,
                           pc=make_ilu(Jh), ksp_type="gmres",
                           rtol=1e-5, atol=1e-50, maxits=200)
            x, _, fn2, _, _ = _linesearch_bt(
                F, x, rk.x, Fx, jnp.asarray(fnorm), cfg, None)
        assert float(jnp.linalg.norm(F(x))) < final_small

    def test_problem_type_0_u_only(self):
        Fu, Fk = self._residuals()
        u0, k0 = self._initial()
        kfix = jnp.asarray(k0)
        self._newton(lambda u: Fu(u, kfix), u0, self._pattern(0),
                     [20.0032], 1e-11)

    def test_problem_type_1_k_only(self):
        Fu, Fk = self._residuals()
        u0, k0 = self._initial()
        ufix = jnp.asarray(u0)
        self._newton(lambda k: Fk(ufix, k), k0, self._pattern(1),
                     [0.372904, 0.0717451, 0.00363009, 1.10244e-05],
                     1e-9)

    def test_problem_type_2_coupled(self):
        Fu, Fk = self._residuals()
        u0, k0 = self._initial()
        mu = self.MU

        def F(x):
            return jnp.concatenate([Fu(x[:mu], x[mu:]),
                                    Fk(x[:mu], x[mu:])])

        # inner GMRES+ILU stops at rtol 1e-5; the Newton steps agree
        # with the oracle only to that tolerance ball (~5 digits here)
        self._newton(F, np.concatenate([u0, k0]), self._pattern(2),
                     [20.0067, 0.150179, 0.109934, 0.0140264,
                      0.000304759, 1.23654e-07], 1e-6, rtol=2e-3)


def test_newton_l2_cp_linesearches():
    """-snes_linesearch_type l2|cp on Newton (the helpers previously
    only served nrichardson/ncg/fas; linesearchl2.c / linesearchcp.c
    wired through SNESConfig.linesearch)."""
    import jax.numpy as jnp

    from petsctpu.dm import DA
    from petsctpu.ksp.common import KSPConfig
    from petsctpu.models.bratu import (bratu_initial_guess,
                                       bratu_jacobian_template,
                                       bratu_residual)
    from petsctpu.snes.api import SNESConfig, snes_solve
    from petsctpu.snes.fdjac import ColoredJacobian

    da = DA((12, 12))
    its = {}
    for ls in ("bt", "l2", "cp"):
        r = snes_solve(
            bratu_residual(da, 5.0), bratu_initial_guess(da, 5.0),
            jac=ColoredJacobian.from_stencil(bratu_jacobian_template(da)),
            cfg=SNESConfig(rtol=1e-8, linesearch=ls),
            ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-8, maxits=500))
        assert int(r.reason) > 0, ls
        its[ls] = int(r.its)
    # all converge at the Newton rate on this mild problem
    assert max(its.values()) <= 5, its
