"""TSGL general linear methods (IRKS schemes from gl.c)."""

import jax.numpy as jnp
import numpy as np

from petsctpu.ts import ts_gl


def decay(t, u):
    return -u


class TestGL:
    def test_order2_convergence(self):
        errs = []
        for dt in (0.1, 0.05):
            r = ts_gl(decay, jnp.asarray([1.0]), order=2, dt=dt,
                      max_time=1.0)
            errs.append(abs(float(r.u[0]) - np.exp(-1.0)))
        assert errs[0] / errs[1] > 3.0          # second order

    def test_order1_converges(self):
        errs = []
        for dt in (0.1, 0.05):
            r = ts_gl(decay, jnp.asarray([1.0]), order=1, dt=dt,
                      max_time=1.0)
            errs.append(abs(float(r.u[0]) - np.exp(-1.0)))
        assert errs[1] < errs[0] and errs[1] < 2e-4

    def test_L_stable_stiff(self):
        """IRKS schemes are A- and L-stable: λ=-1000 at dt=0.1 decays
        to ~0 with no oscillation (gl.c scheme notes)."""
        r = ts_gl(lambda t, u: -1000.0 * u, jnp.asarray([1.0]), order=2,
                  dt=0.1, max_time=1.0)
        assert abs(float(r.u[0])) < 1e-10

    def test_nonlinear_system(self):
        # logistic equation
        r = ts_gl(lambda t, u: u * (1.0 - u), jnp.asarray([0.1]), order=2,
                  dt=0.05, max_time=2.0)
        exact = 0.1 * np.exp(2.0) / (1 - 0.1 + 0.1 * np.exp(2.0))
        np.testing.assert_allclose(float(r.u[0]), exact, atol=2e-4)
