"""Method of characteristics (semi-Lagrangian) and SNES multiblock."""

import jax.numpy as jnp
import numpy as np

from petsctpu.snes import snes_multiblock
from petsctpu.ts import ts_characteristic


class TestCharacteristic:
    def test_uniform_translation(self):
        """Constant velocity translates the profile exactly along
        characteristics (up to interpolation diffusion)."""
        m = n = 65
        xs = np.linspace(0, 1, m)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        u0 = np.exp(-200 * ((X - 0.3) ** 2 + (Y - 0.5) ** 2))

        def vel(t, u):
            return (jnp.full((m, n), 0.5), jnp.zeros((m, n)))

        r = ts_characteristic(vel, jnp.asarray(u0), (m, n), dt=0.05,
                              max_time=0.5)
        uT = np.asarray(r.u)
        exact = np.exp(-200 * ((X - 0.55) ** 2 + (Y - 0.5) ** 2))
        # peak moved to x=0.55; bilinear diffuses but peak location holds
        i, j = np.unravel_index(np.argmax(uT), (m, n))
        assert abs(xs[i] - 0.55) < 0.03 and abs(xs[j] - 0.5) < 0.03
        assert np.abs(uT - exact).max() < 0.4
        assert uT.max() > 0.5        # profile survives, not smeared away

    def test_rotation_returns(self):
        """Solid-body rotation by 2π returns the initial profile."""
        m = n = 65
        xs = np.linspace(0, 1, m)
        X, Y = np.meshgrid(xs, xs, indexing="ij")
        u0 = np.exp(-100 * ((X - 0.7) ** 2 + (Y - 0.5) ** 2))
        om = 2 * np.pi
        VX = jnp.asarray(-om * (Y - 0.5))
        VY = jnp.asarray(om * (X - 0.5))

        def vel(t, u):
            return (VX, VY)

        r = ts_characteristic(vel, jnp.asarray(u0), (m, n), dt=0.005,
                              max_time=1.0)
        uT = np.asarray(r.u)
        i, j = np.unravel_index(np.argmax(uT), (m, n))
        assert abs(xs[i] - 0.7) < 0.05 and abs(xs[j] - 0.5) < 0.05

    def test_unconditionally_stable_large_dt(self):
        """Semi-Lagrangian survives CFL >> 1 (its reason to exist)."""
        m = n = 33
        u0 = np.zeros((m, n))
        u0[16, 16] = 1.0

        def vel(t, u):
            return (jnp.full((m, n), 10.0), jnp.zeros((m, n)))

        r = ts_characteristic(vel, jnp.asarray(u0), (m, n), dt=0.1,
                              max_time=0.5)     # CFL = 10*0.1/(1/32) = 32
        assert np.isfinite(np.asarray(r.u)).all()
        assert np.asarray(r.u).max() <= 1.0 + 1e-12


class TestMultiblock:
    def test_two_field_newton(self):
        """Coupled 2-field system solved field-by-field (multiplicative);
        F0: x0² + x1 − 3 = 0 (field 0), F1: x0 + x1² − 5 = 0 (field 1)."""

        def F(z):
            return jnp.stack([z[0] ** 2 + z[1] - 3.0,
                              z[0] + z[1] ** 2 - 5.0])

        res = snes_multiblock(F, jnp.asarray([1.0, 1.5]),
                              [[0], [1]], mode="multiplicative",
                              rtol=1e-10, maxits=60)
        assert res.converged
        z = np.asarray(res.x)
        np.testing.assert_allclose(z[0] ** 2 + z[1], 3.0, atol=1e-7)
        np.testing.assert_allclose(z[0] + z[1] ** 2, 5.0, atol=1e-7)

    def test_additive_mode(self):
        def F(z):
            return jnp.stack([2.0 * z[0] - 1.0, 3.0 * z[1] - 2.0])

        res = snes_multiblock(F, jnp.zeros(2), [[0], [1]], mode="additive",
                              rtol=1e-10, maxits=60)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), [0.5, 2 / 3],
                                   atol=1e-8)
