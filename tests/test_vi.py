import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.models import laplacian_2d
from petsctpu.snes.vi import snes_vinewtonrsls, snes_vinewtonssls


class TestVI:
    def test_obstacle_problem(self):
        """1-D obstacle: -u'' = f with u >= psi; complementarity holds."""
        n = 40
        h = 1.0 / (n + 1)
        A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                     [-1, 0, 1]).tocsr() / h ** 2
        xs = np.linspace(h, 1 - h, n)
        f = -8.0 * np.ones(n)                      # pushes u down
        psi = -0.2 + 0.4 * (xs - 0.5) ** 2         # obstacle from below
        Ad = jnp.asarray(A.toarray())

        def F(u):
            return Ad @ u - jnp.asarray(f)

        res = snes_vinewtonrsls(F, jnp.zeros(n), lb=jnp.asarray(psi),
                                ub=jnp.full(n, 1e20), rtol=1e-10, maxits=50)
        assert res.converged, int(res.reason)
        u = np.asarray(res.x)
        Fu = A @ u - f
        # feasibility
        assert np.all(u >= psi - 1e-9)
        # complementarity: contact → F >= 0; free → F ≈ 0
        contact = u <= psi + 1e-8
        assert contact.any() and (~contact).any()   # mixed active set
        assert np.all(Fu[contact] >= -1e-7)
        np.testing.assert_allclose(Fu[~contact], 0.0, atol=1e-7)

    def test_reduces_to_newton_when_unconstrained(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(1.0, 2.0, 10))

        def F(x):
            return x * x - a

        res = snes_vinewtonrsls(F, jnp.ones(10), lb=-1e20, ub=1e20,
                                rtol=1e-12)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.sqrt(np.asarray(a)), atol=1e-9)

    def test_upper_bound(self):
        def F(x):
            return x - 5.0       # wants x = 5

        res = snes_vinewtonrsls(F, jnp.zeros(4), lb=-1e20, ub=2.0,
                                rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-9)


class TestVISemismooth:
    """SNESVINEWTONSSLS (src/snes/impls/vi/ss): Fischer-Burmeister
    Newton with merit line search."""

    def _obstacle(self, n=40):
        h = 1.0 / (n + 1)
        A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                     [-1, 0, 1]).tocsr() / h ** 2
        xs = np.linspace(h, 1 - h, n)
        f = -8.0 * np.ones(n)
        psi = -0.2 + 0.4 * (xs - 0.5) ** 2
        Ad = jnp.asarray(A.toarray())

        def F(u):
            return Ad @ u - jnp.asarray(f)

        return F, A, f, psi, n

    def test_obstacle_matches_rsls(self):
        F, A, f, psi, n = self._obstacle()
        r_ss = snes_vinewtonssls(F, jnp.zeros(n), lb=jnp.asarray(psi),
                                 ub=jnp.full(n, 1e20), rtol=1e-10,
                                 maxits=60)
        r_rs = snes_vinewtonrsls(F, jnp.zeros(n), lb=jnp.asarray(psi),
                                 ub=jnp.full(n, 1e20), rtol=1e-10,
                                 maxits=60)
        assert r_ss.converged, int(r_ss.reason)
        u = np.asarray(r_ss.x)
        np.testing.assert_allclose(u, np.asarray(r_rs.x), atol=1e-7)
        Fu = A @ u - f
        assert np.all(u >= psi - 1e-8)
        contact = u <= psi + 1e-7
        assert contact.any() and (~contact).any()
        assert np.all(Fu[contact] >= -1e-6)
        np.testing.assert_allclose(Fu[~contact], 0.0, atol=1e-6)

    def test_phi_matches_reference_oracle(self):
        """‖Φ(x₀)‖ on the 1-D obstacle problem (n=40, ψ=-0.2+0.4(x-½)²,
        F = A u + 8) matches a reference-source oracle running
        SNESVINEWTONSSLS (scripts/mint_vi_oracle.c):
        '0 SNES Function norm 1.067412728097e+00'. Pins the verbatim
        Phi/DPhi composition (viss.c:37-47,61-91); the subsequent
        trajectory differs only in the line search (ours: Armijo,
        converging in ~24 its vs the reference bt's 43)."""
        from petsctpu.snes.vi import _phi_fb
        n = 40
        h = 1.0 / (n + 1)
        A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                     [-1, 0, 1]).tocsr() / h ** 2
        xs = np.linspace(h, 1 - h, n)
        psi = -0.2 + 0.4 * (xs - 0.5) ** 2
        x0 = np.zeros(n)
        F0 = A @ x0 + 8.0
        phi = _phi_fb(jnp.asarray(x0 - psi), jnp.asarray(F0))
        np.testing.assert_allclose(float(jnp.linalg.norm(phi)),
                                   1.067412728097, rtol=1e-11)

    def test_unconstrained_is_newton(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(1.0, 2.0, 10))

        def F(x):
            return x * x - a

        res = snes_vinewtonssls(F, jnp.ones(10), lb=-1e20, ub=1e20,
                                rtol=1e-12)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.sqrt(np.asarray(a)), atol=1e-9)

    def test_two_sided_box(self):
        """x ∈ [0, 2], F = x - 5: solution pinned at ub with F < 0."""
        def F(x):
            return x - 5.0

        res = snes_vinewtonssls(F, jnp.zeros(4), lb=0.0, ub=2.0,
                                rtol=1e-10, maxits=60)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-8)

    def test_nonlinear_2d_obstacle(self):
        """2-D obstacle under a nonlinear reaction term: ss and rs
        agree on the contact set and solution."""
        m = 12
        A = laplacian_2d(m, m, dtype=np.float64).tocsr()
        Ad = jnp.asarray(A.toarray()) * (m + 1) ** 2
        n = m * m
        ij = np.indices((m, m)).reshape(2, -1) / (m + 1)

        def F(u):
            return Ad @ u + 0.5 * u ** 3 + 6.0

        psi = -0.3 + 0.5 * ((ij[0] - 0.5) ** 2 + (ij[1] - 0.5) ** 2)
        r_ss = snes_vinewtonssls(F, jnp.zeros(n), lb=jnp.asarray(psi),
                                 ub=1e20, rtol=1e-9, maxits=80)
        r_rs = snes_vinewtonrsls(F, jnp.zeros(n), lb=jnp.asarray(psi),
                                 ub=1e20, rtol=1e-9, maxits=80)
        assert r_ss.converged and r_rs.converged
        np.testing.assert_allclose(np.asarray(r_ss.x),
                                   np.asarray(r_rs.x), atol=1e-6)
