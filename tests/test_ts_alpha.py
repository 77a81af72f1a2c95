"""TSALPHA (generalized-α) and the CFL step-size adaptor."""

import jax.numpy as jnp
import numpy as np

from petsctpu.ts import ts_alpha, ts_solve


def decay_rhs(t, u):
    return -u


class TestAlpha:
    def test_second_order(self):
        u0 = jnp.asarray([1.0])
        errs = []
        for dt in (0.1, 0.05):
            r = ts_alpha(decay_rhs, u0, dt=dt, max_time=1.0)
            errs.append(abs(float(r.u[0]) - np.exp(-1.0)))
        assert errs[0] / errs[1] > 3.5      # ~second order

    def test_oscillator_damping_radius(self):
        """ρ∞ controls high-frequency damping: ρ=0 damps a stiff
        oscillation harder than ρ=1 at the same (coarse) step."""

        def rhs(t, u):
            return jnp.stack([u[1], -400.0 * u[0]])

        u0 = jnp.asarray([1.0, 0.0])
        amp = {}
        for rho in (0.0, 1.0):
            r = ts_alpha(rhs, u0, dt=0.05, max_time=2.0, alpha_radius=rho,
                         max_steps=100)
            amp[rho] = abs(float(r.u[0])) + abs(float(r.u[1])) / 20.0
        assert amp[0.0] < 0.1 * amp[1.0]

    def test_nonlinear(self):
        # logistic u' = u(1-u), u(0)=0.1 → exact solution known
        def rhs(t, u):
            return u * (1.0 - u)

        r = ts_alpha(rhs, jnp.asarray([0.1]), dt=0.02, max_time=2.0)
        exact = 0.1 * np.exp(2.0) / (1 - 0.1 + 0.1 * np.exp(2.0))
        np.testing.assert_allclose(float(r.u[0]), exact, atol=1e-3)


class TestCFLAdaptor:
    def test_dt_capped_by_cfl(self):
        seen = []

        def cfl(t, u):
            return jnp.asarray(0.02)

        r = ts_solve(decay_rhs, jnp.asarray([1.0]), ts_type="euler", dt=0.5,
                     max_time=1.0, cfl_fn=cfl, cfl_safety=0.5,
                     max_steps=1000)
        # dt was capped at 0.5*0.02 = 0.01 → ~100 steps
        assert 95 <= int(r.steps) <= 105
        np.testing.assert_allclose(float(r.u[0]), np.exp(-1.0), atol=5e-3)
