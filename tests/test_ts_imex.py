import jax.numpy as jnp
import numpy as np

from petsctpu.ksp.common import KSPConfig
from petsctpu.ts.imex import ts_arkimex, ts_rosw
from petsctpu.ts.steppers import TSConfig


def split_stiff():
    """u' = -u (explicit part) - 500 u (implicit part)."""
    lam_e, lam_i = -1.0, -500.0

    def fe(t, u):
        return lam_e * u

    def fi(t, u):
        return lam_i * u

    return fe, fi, lam_e + lam_i


class TestARKIMEX:
    def test_stiff_stability_and_accuracy(self):
        fe, fi, lam = split_stiff()
        u0 = jnp.asarray([1.0])
        for tab in ("ars122", "a2"):
            r = ts_arkimex(fe, fi, u0, tableau=tab, dt=0.01, max_time=0.1)
            exact = np.exp(lam * 0.1)
            got = float(r.u[0])
            assert np.isfinite(got), tab
            assert abs(got - exact) < 5e-3, (tab, got, exact)

    def test_order_two(self):
        # nonstiff split problem: u' = sin(t) (E) + (-u) (I)
        def fe(t, u):
            return jnp.full_like(u, jnp.sin(t))

        def fi(t, u):
            return -u

        def exact(t):
            return 0.5 * (np.exp(-t) + np.sin(t) - np.cos(t)) + np.exp(-t)

        u0 = jnp.asarray([1.0])
        errs = []
        for dt in (0.05, 0.025):
            r = ts_arkimex(fe, fi, u0, tableau="a2", dt=dt, max_time=1.0)
            errs.append(abs(float(r.u[0]) - exact(1.0)))
        assert errs[0] / errs[1] > 3.0   # ~2nd order


class TestRosW:
    def test_stiff_decay(self):
        def rhs(t, u):
            return -1000.0 * u

        r = ts_rosw(rhs, jnp.asarray([1.0]), dt=0.01, max_time=0.1,
                    ksp=KSPConfig(ksp_type="gmres", rtol=1e-10, maxits=50))
        assert np.isfinite(float(r.u[0]))
        assert abs(float(r.u[0])) < 1e-3

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
