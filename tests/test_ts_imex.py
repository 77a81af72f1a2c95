import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.ksp.common import KSPConfig
from petsctpu.snes.api import SNESConfig
from petsctpu.ts.imex import (
    arkimex_tableaus, register_ros4, rosw_tableaus, ts_arkimex, ts_rosw,
    _ROSW_TABLEAUS,
)
from petsctpu.ts.steppers import TSConfig

TIGHT_SNES = SNESConfig(rtol=1e-12, atol=1e-14, maxits=30)
TIGHT_KSP = KSPConfig(ksp_type="gmres", rtol=1e-13, maxits=60)


def split_stiff():
    """u' = -u (explicit part) - 500 u (implicit part)."""
    lam_e, lam_i = -1.0, -500.0

    def fe(t, u):
        return lam_e * u

    def fi(t, u):
        return lam_i * u

    return fe, fi, lam_e + lam_i


class TestARKIMEX:
    def test_registry_complete(self):
        # the 13 tableaus of TSARKIMEXRegisterAll (arkimex.c:215-413)
        assert arkimex_tableaus() == sorted(
            ["1bee", "ars122", "a2", "l2", "2c", "2d", "2e", "prssp2",
             "3", "ars443", "bpr3", "4", "5"])

    def test_stiff_stability_and_accuracy(self):
        fe, fi, lam = split_stiff()
        u0 = jnp.asarray([1.0])
        # (the reference's "a2" trapezoid-completion tableau is A- but
        # not L-stable — |hλ|=5 sits outside its stability region)
        for tab in ("ars122", "l2", "2e", "3"):
            r = ts_arkimex(fe, fi, u0, tableau=tab, dt=0.01, max_time=0.1)
            exact = np.exp(lam * 0.1)
            got = float(r.u[0])
            assert np.isfinite(got), tab
            assert abs(got - exact) < 5e-3, (tab, got, exact)

    @pytest.mark.parametrize("tab,order", [
        ("ars122", 2), ("l2", 2), ("2c", 2), ("2d", 2), ("2e", 2),
        ("prssp2", 2), ("3", 3), ("ars443", 3), ("4", 4), ("5", 4),
    ])
    def test_design_order(self, tab, order):
        # nonstiff split problem: u' = sin(t) (E) + (-u) (I)
        def fe(t, u):
            return jnp.full_like(u, jnp.sin(t))

        def fi(t, u):
            return -u

        def exact(t):
            return 0.5 * (np.exp(-t) + np.sin(t) - np.cos(t)) + np.exp(-t)

        u0 = jnp.asarray([1.0])
        errs = []
        for dt in (0.1, 0.05):
            r = ts_arkimex(fe, fi, u0, tableau=tab, dt=dt, max_time=1.0,
                           snes=TIGHT_SNES, ksp=TIGHT_KSP)
            errs.append(abs(float(r.u[0]) - exact(1.0)))
        observed = np.log2(errs[0] / max(errs[1], 1e-16))
        assert observed > order - 0.35, (tab, observed, errs)

    def test_bootstrap_tableaus_stable(self):
        # 1bee/a2/bpr3 couple their splits loosely (mismatched c rows
        # in the reference registrations) — check stability + >=1st
        # order on the stiff decay problem rather than design order.
        fe, fi, lam = split_stiff()
        u0 = jnp.asarray([1.0])
        for tab in ("1bee", "bpr3"):
            r = ts_arkimex(fe, fi, u0, tableau=tab, dt=0.02, max_time=0.2)
            assert np.isfinite(float(r.u[0])), tab
            assert abs(float(r.u[0])) < 1e-3, tab

    def test_adaptive_embedded(self):
        def fe(t, u):
            return jnp.full_like(u, jnp.sin(t))

        def fi(t, u):
            return -u

        r = ts_arkimex(fe, fi, jnp.asarray([1.0]), tableau="3", dt=0.2,
                       max_time=1.0, adapt=True, adapt_rtol=1e-6,
                       adapt_atol=1e-8, snes=TIGHT_SNES, ksp=TIGHT_KSP)
        exact = 0.5 * (np.exp(-1) + np.sin(1) - np.cos(1)) + np.exp(-1)
        assert abs(float(r.u[0]) - exact) < 1e-5

    def test_unknown_tableau_raises(self):
        with pytest.raises(ValueError, match="unknown arkimex"):
            ts_arkimex(lambda t, u: u, lambda t, u: u, jnp.asarray([1.0]),
                       tableau="nope")


class TestRosW:
    def test_registry_complete(self):
        # the 16 tableaus of TSRosWRegisterAll (rosw.c:308-588)
        assert rosw_tableaus() == sorted(
            ["theta1", "theta2", "2m", "2p", "ra3pw", "ra34pw2", "rodas3",
             "sandu3", "assp3p3s1c", "lassp3p4s2c", "llssp3p4s2c", "ark3",
             "grk4t", "shamp4", "veldd4", "4l"])

    def test_stiff_decay(self):
        def rhs(t, u):
            return -1000.0 * u

        for tab in ("2p", "rodas3", "ra3pw", "grk4t"):
            r = ts_rosw(rhs, jnp.asarray([1.0]), dt=0.01, max_time=0.1,
                        tableau=tab,
                        ksp=KSPConfig(ksp_type="gmres", rtol=1e-10,
                                      maxits=50))
            assert np.isfinite(float(r.u[0])), tab
            assert abs(float(r.u[0])) < 1e-2, tab

    def test_order_two_nonlinear(self):
        def rhs(t, u):
            return u * (1.0 - u)

        u0 = jnp.asarray([0.1])
        exact = 0.1 * np.exp(2.0) / (1 - 0.1 + 0.1 * np.exp(2.0))
        errs = []
        for dt in (0.1, 0.05):
            r = ts_rosw(rhs, u0, dt=dt, max_time=2.0,
                        ksp=KSPConfig(ksp_type="gmres", rtol=1e-12,
                                      maxits=50))
            errs.append(abs(float(r.u[0]) - exact))
        assert errs[0] / errs[1] > 3.0

    @pytest.mark.parametrize("tab,order", [
        ("theta1", 1), ("theta2", 2), ("2m", 2), ("2p", 2),
        ("ra3pw", 3), ("ra34pw2", 3), ("sandu3", 3), ("ark3", 3),
        ("assp3p3s1c", 3), ("lassp3p4s2c", 3), ("llssp3p4s2c", 3),
        ("rodas3", 2.5), ("grk4t", 4), ("shamp4", 4), ("veldd4", 4),
        ("4l", 4),
    ])
    def test_design_order(self, tab, order):
        def rhs(t, u):
            return u * (1.0 - u)

        u0 = jnp.asarray([0.1])
        exact = 0.1 * np.exp(2.0) / (1 - 0.1 + 0.1 * np.exp(2.0))
        errs = []
        for dt in (0.2, 0.1):
            r = ts_rosw(rhs, u0, dt=dt, max_time=2.0, tableau=tab,
                        ksp=TIGHT_KSP)
            errs.append(abs(float(r.u[0]) - exact))
        observed = np.log2(errs[0] / max(errs[1], 1e-17))
        assert observed > order - 0.5, (tab, observed, errs)

    def test_ros4_construction_matches_order_conditions(self):
        # register_ros4 reproduces TSRosWRegisterRos4 (rosw.c:830):
        # 4 stages, gamma on the diagonal, 3rd-order embedded row
        tab = register_ros4("tmp_ros4", 0.395)
        assert tab["s"] == 4
        assert np.allclose(np.diag(tab["Gamma"]), 0.395)
        assert abs(tab["b"].sum() - 1.0) < 1e-12
        _ROSW_TABLEAUS.pop("tmp_ros4")

    def test_adaptive_embedded(self):
        def rhs(t, u):
            return -u + jnp.sin(10.0 * t)

        r = ts_rosw(rhs, jnp.asarray([1.0]), dt=0.5, max_time=2.0,
                    tableau="ra3pw", adapt=True, adapt_rtol=1e-5,
                    adapt_atol=1e-7, max_steps=20000, ksp=TIGHT_KSP)
        exact = (np.exp(-2.0) * (1 + 10.0 / 101.0)
                 + (np.sin(20.0) - 10 * np.cos(20.0)) / 101.0)
        assert float(r.t) > 2.0 - 1e-10      # reached the horizon
        assert abs(float(r.u[0]) - exact) < 1e-3

    def test_explicit_first_stage_tableau(self):
        # assp3p3s1c has Gamma[0,0] = 0 — exercises the explicit-stage
        # branch with the GammaExplicitCorr Jacobian correction
        def rhs(t, u):
            return -4.0 * u

        r = ts_rosw(rhs, jnp.asarray([1.0]), dt=0.05, max_time=1.0,
                    tableau="assp3p3s1c", ksp=TIGHT_KSP)
        assert abs(float(r.u[0]) - np.exp(-4.0)) < 2e-4


class TestEx22AdvectionReaction:
    """TS ex22 — 1-D advection-reaction IMEX (goldens ex22_1/2/3.out).

    The golden lines pin the reference TSSolve duration semantics
    (no dt clamping — overshoot to 1.00025 after 4001 steps,
    ts.c:2429-2437) and the step counts; the final-state norms are
    pinned against a direct oracle run of ex22 (norm-instrumented,
    /tmp oracle build) to full W-method/ARK digits.
    """

    def _setup(self):
        from petsctpu.models.adr1d import (adr_initial, adr_rhs_advection,
                                           adr_rhs_reaction)
        mx = 200
        return (adr_initial(mx), adr_rhs_advection(mx),
                adr_rhs_reaction(mx))

    def test_ex22_1_arkimex4(self):
        # CONVERGED_TIME at time 1.00025 after 4001 steps (ex22_1.out)
        from petsctpu.models.adr1d import ts_reason_string
        u0, fexp, fimp = self._setup()
        cfg = TSConfig(dt=0.1 / 400.0, max_steps=10000, max_time=1.0,
                       clamp_final=False)
        r = ts_arkimex(fexp, fimp, u0, cfg, tableau="4")
        line = "%s at time %g after %d steps" % (
            ts_reason_string(int(r.steps), float(r.t), 10000, 1.0),
            float(r.t), int(r.steps))
        assert line == "CONVERGED_TIME at time 1.00025 after 4001 steps"
        # oracle (norm-instrumented ex22): norm2 2.146663982946270e+01
        assert abs(float(jnp.linalg.norm(r.u)) - 2.146663982946270e+01) < 1e-10

    @pytest.mark.parametrize("dt,steps,norm2", [
        (1e-3, 1000, 2.146731546878391e+01),   # ex22_2.out
        (5e-3, 200, 2.146401500573015e+01),    # ex22_3.out
    ])
    def test_ex22_rosw_ra34pw2(self, dt, steps, norm2):
        from petsctpu.models.adr1d import ts_reason_string
        u0, fexp, fimp = self._setup()

        def rhs(t, x):
            return fexp(t, x) + fimp(t, x)

        cfg = TSConfig(dt=dt, max_steps=10000, max_time=1.0,
                       clamp_final=False)
        # jac_fn=fimp = the reference's IJacobian (reaction only): the
        # W-method trajectory depends on the approximate J used
        r = ts_rosw(rhs, u0, cfg, tableau="ra34pw2", jac_fn=fimp)
        line = "%s at time %g after %d steps" % (
            ts_reason_string(int(r.steps), float(r.t), 10000, 1.0),
            float(r.t), int(r.steps))
        assert line == "CONVERGED_TIME at time 1 after %d steps" % steps
        assert abs(float(jnp.linalg.norm(r.u)) - norm2) < 1e-9
