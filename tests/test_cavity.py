import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.ksp.common import KSPConfig
from petsctpu.models.cavity import (cavity_initial_guess,
                                    cavity_jacobian_pattern,
                                    cavity_residual)
from petsctpu.snes import ColoredJacobian, snes_solve
from petsctpu.pc.simple import JacobiPC


class TestEx19Golden:
    """Reference golden: output/ex19_1.out — 25x25 grid, lid velocity
    0.0016: SNES norms 0.0406612 → 3.35993e-06 → 2.643e-11, 2 its."""

    def test_initial_fnorm_matches_golden(self):
        F = cavity_residual(25, 25)
        x0 = cavity_initial_guess(25, 25)
        f0 = float(jnp.linalg.norm(F(x0)))
        np.testing.assert_allclose(f0, 0.0406612, rtol=2e-5)

    def test_newton_two_iterations(self):
        mx = my = 25
        F = cavity_residual(mx, my)
        res = snes_solve(F, cavity_initial_guess(mx, my), jac="jvp",
                         rtol=1e-8,
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                           maxits=2000, restart=100))
        assert res.converged
        assert int(res.its) == 2
        h = np.asarray(res.history[:3])
        np.testing.assert_allclose(h[0], 0.0406612, rtol=2e-5)
        assert h[1] < 1e-5 and h[2] < 1e-9

    def test_colored_jacobian_path(self):
        """Assembled FD-colored Jacobian with Jacobi PC: same solution."""
        mx = my = 13
        F = cavity_residual(mx, my)
        x0 = cavity_initial_guess(mx, my)
        from petsctpu.mat import aij_from_scipy
        patt = cavity_jacobian_pattern(mx, my)
        template = aij_from_scipy(patt)
        plan = ColoredJacobian.from_sparsity(patt, template)
        assert plan.ncolors <= 40
        res = snes_solve(F, x0, jac=plan,
                         pc_builder=lambda J: JacobiPC(1.0 / J.diagonal()),
                         rtol=1e-8,
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                           maxits=2000, restart=100))
        assert res.converged
        r2 = snes_solve(F, x0, jac="jvp", rtol=1e-8,
                        ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                          maxits=2000, restart=100))
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(r2.x),
                                   atol=1e-7)

    def test_higher_grashof_needs_more_newton(self):
        """Physics sanity: stronger buoyancy coupling → harder solve."""
        mx = my = 13
        F = cavity_residual(mx, my, grashof=1000.0)
        res = snes_solve(F, cavity_initial_guess(mx, my, 1000.0), jac="jvp",
                         rtol=1e-8, maxits=30,
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                           maxits=3000, restart=120))
        assert res.converged
        assert int(res.its) >= 2
        assert float(jnp.linalg.norm(F(res.x))) < 1e-8
