"""snes ex35 goldens — linear Laplacian as a nonlinear problem.

Reference: src/snes/examples/tutorials/ex35.c + makefile runex35..
runex35_8 (output/ex35_*.out — all eight confirmed current by the
reference-source oracle). The example demonstrates that nonlinear
solvers applied to the LINEAR system F(x) = A·x − b reproduce their
linear counterparts iteration-for-iteration:

    nrichardson  ==  richardson + self-scale      (ex35_1 vs ex35_2)
    ngmres       ==  gmres (pc none)              (ex35_3 vs ex35_4)
    ncg          ==  cg (pc none)                 (ex35_5 vs ex35_6)

The RHS is VecSetRandom — PETSc's default drand48 stream, replicated
bit-exactly by core.random.Rand48 (seed 0x12345678, randomc.c:376).
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from petsctpu.ksp.api import ksp_solve                      # noqa: E402
from petsctpu.mat.ell import aij_from_scipy                 # noqa: E402
from petsctpu.models.laplin import ex35_matrix, ex35_rhs    # noqa: E402

# output/ex35_1.out == output/ex35_2.out's KSP stream (the monitored
# digits; tail entries below 1e-9 print fewer digits, checked coarser)
EX35_HISTORY = [2.17647, 0.339505, 0.14509, 0.0628587, 0.0275259,
                0.0120841, 0.0053142, 0.00233793, 0.00102882,
                0.000452765, 0.000199262, 8.76957e-05, 3.85954e-05,
                1.69861e-05, 7.47569e-06, 3.2901e-06, 1.448e-06,
                6.37274e-07, 2.80469e-07, 1.23436e-07, 5.43251e-08,
                2.39089e-08, 1.05225e-08, 4.63101e-09, 2.03814e-09]


def _system():
    A = ex35_matrix(4)
    b = ex35_rhs(4)
    return A, b


class TestEx35RandomRHS:
    def test_drand48_stream(self):
        """norm(b) equals the goldens' initial function norms on both
        the 4x4 (2.17647) and da_refine-2 13x13 (7.46324) grids."""
        np.testing.assert_allclose(np.linalg.norm(ex35_rhs(4)),
                                   2.17647, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(ex35_rhs(13)),
                                   7.46324, rtol=1e-5)


class TestEx35NonlinearVsLinear:
    def test_ex35_1_nrichardson(self):
        """runex35: -snes_type nrichardson -snes_rtol 1e-12
        (output/ex35_1.out, 25 full-precision lines checked)."""
        from petsctpu.snes.api import snes_nrichardson
        A, b = _system()
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)
        F = lambda x: Ad.mult(x) - bj                       # noqa: E731
        r = snes_nrichardson(F, jnp.zeros_like(bj), rtol=1e-12,
                             maxits=40)
        np.testing.assert_allclose(
            np.asarray(r.history[:len(EX35_HISTORY)]), EX35_HISTORY,
            rtol=2e-5)

    def test_ex35_2_richardson_self_scale(self):
        """runex35_2: -ksp_type richardson -pc_type none
        -ksp_richardson_self_scale -ksp_rtol 1e-12 — the LINEAR twin
        of nrichardson: identical residual stream (output/ex35_2.out),
        and the outer Newton converges in one iteration."""
        A, b = _system()
        r = ksp_solve(aij_from_scipy(A), jnp.asarray(b),
                      ksp_type="richardson", richardson_self_scale=True,
                      rtol=1e-12, atol=1e-50, maxits=10000)
        np.testing.assert_allclose(
            np.asarray(r.history[:len(EX35_HISTORY)]), EX35_HISTORY,
            rtol=2e-5)

    def test_ex35_3_ngmres(self):
        """runex35_3: -snes_type ngmres (output/ex35_3.out)."""
        from petsctpu.snes.variants import snes_ngmres
        A, b = _system()
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)
        F = lambda x: Ad.mult(x) - bj                       # noqa: E731
        r = snes_ngmres(F, jnp.zeros_like(bj), rtol=1e-12, maxits=10)
        np.testing.assert_allclose(np.asarray(r.history[:3]),
                                   [2.17647, 0.339505, 0.138169],
                                   rtol=2e-5)
        assert float(r.history[3]) < 1e-11

    def test_ex35_4_gmres(self):
        """runex35_4: -ksp_type gmres -pc_type none — the linear twin
        of ngmres (output/ex35_4.out)."""
        A, b = _system()
        r = ksp_solve(aij_from_scipy(A), jnp.asarray(b),
                      ksp_type="gmres", rtol=1e-12, atol=1e-50,
                      maxits=10000)
        np.testing.assert_allclose(np.asarray(r.history[:3]),
                                   [2.17647, 0.339505, 0.138169],
                                   rtol=2e-5)
        assert float(r.history[3]) < 1e-11

    def test_ex35_5_ncg(self):
        """runex35_5: -snes_type ncg (default PRP beta,
        output/ex35_5.out)."""
        from petsctpu.snes.fas import snes_ncg
        A, b = _system()
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)
        F = lambda x: Ad.mult(x) - bj                       # noqa: E731
        r = snes_ncg(F, jnp.zeros_like(bj), rtol=1e-12, maxits=10)
        np.testing.assert_allclose(np.asarray(r.history[:3]),
                                   [2.17647, 0.343713, 0.151262],
                                   rtol=2e-5)
        assert float(r.history[3]) < 1e-11

    def test_ex35_6_cg(self):
        """runex35_6: -ksp_type cg -pc_type none — the linear twin of
        ncg (output/ex35_6.out)."""
        A, b = _system()
        r = ksp_solve(aij_from_scipy(A), jnp.asarray(b),
                      ksp_type="cg", rtol=1e-12, atol=1e-50,
                      maxits=10000)
        np.testing.assert_allclose(np.asarray(r.history[:3]),
                                   [2.17647, 0.343713, 0.151262],
                                   rtol=2e-5)
        assert float(r.history[3]) < 1e-11

    def test_newton_one_iteration(self):
        """The outer Newton of runex35_2/4/6 converges in ONE
        iteration on the linear problem (1 SNES Function norm
        < 1.e-11)."""
        from petsctpu.snes import snes_solve
        A, b = _system()
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)
        F = lambda x: Ad.mult(x) - bj                       # noqa: E731
        r = snes_solve(F, jnp.zeros_like(bj), jac=lambda x, Fx: Ad,
                       rtol=1e-12, maxits=5)
        assert int(r.its) == 1
        assert float(r.history[1]) < 1e-11


class TestEx35MG:
    def test_ex35_7_richardson_mg(self):
        """runex35_7: -da_refine 2 -pc_type mg -mg_levels_ksp_type
        richardson -mg_levels_pc_type none
        -mg_levels_ksp_richardson_self_scale -ksp_type richardson
        -ksp_rtol 1e-12 (output/ex35_7.out): outer Richardson
        monitored in the MG-PRECONDITIONED norm over a REDISCRETIZED
        13->7->4 hierarchy (not Galerkin) with self-scaled Richardson
        smoothers; all 12 KSP values digit-exact and the outer Newton
        converges in one step."""
        from petsctpu.dm.da import q1_interp_scipy
        from petsctpu.pc.mg import make_mg_selfscale_richardson

        As = [ex35_matrix(13), ex35_matrix(7), ex35_matrix(4)]
        Ps = [q1_interp_scipy((13, 13), (7, 7)),
              q1_interp_scipy((7, 7), (4, 4))]
        pc = make_mg_selfscale_richardson(As, Ps)
        b = ex35_rhs(13)
        r = ksp_solve(aij_from_scipy(As[0]), jnp.asarray(b), pc=pc,
                      ksp_type="richardson", rtol=1e-12, atol=1e-50,
                      maxits=10000)
        golden = [33.9803, 3.1922, 0.233905, 0.0148341, 0.00104285,
                  8.11749e-05, 6.6244e-06, 5.47159e-07, 4.57667e-08,
                  3.9511e-09, 3.490e-10, 3.141e-11]
        np.testing.assert_allclose(np.asarray(r.history[:10]),
                                   golden[:10], rtol=2e-5)
        # sub-1e-9 tail prints with fewer digits in the golden
        np.testing.assert_allclose(np.asarray(r.history[10:12]),
                                   golden[10:], rtol=2e-3)
        # converges at the i=11 monitor (3.141e-11 < rtol·33.98)
        assert int(r.its) == 11

    def test_ex35_8_fas(self):
        """runex35_8: -da_refine 2 -snes_type fas -fas_coarse_snes_type
        newtonls -fas_coarse_pc_type lu -fas_coarse_ksp_type preonly
        (output/ex35_8.out): 3-level FAS V-cycles with the fas.c
        default nrichardson smoothers (1 pre/post sweep) on the
        rediscretized 13->7->4 hierarchy; the OUTER monitor stream
        (all 10 values) digit-exact."""
        from petsctpu.dm import DA
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.snes import fas_levels_from_da, snes_fas
        from petsctpu.snes.api import SNESConfig

        b13 = jnp.asarray(ex35_rhs(13))

        def make_residual(d):
            Ad = aij_from_scipy(ex35_matrix(d.grid[0]))
            if d.grid[0] == 13:
                return lambda x: Ad.mult(x) - b13
            return lambda x: Ad.mult(x)

        levels = fas_levels_from_da(DA((13, 13)), make_residual, 3)
        r = snes_fas(levels, jnp.zeros_like(b13), maxits=9, rtol=1e-8,
                     npre=1, npost=1, smoother="nrichardson",
                     coarse_cfg=SNESConfig(maxits=1, rtol=1e-12,
                                           linesearch="bt"),
                     # coarse LU-preonly Newton ≡ an exact inner solve:
                     # tight-tolerance gmres on the 16-var coarse system
                     # is identical to all printed digits
                     coarse_ksp=KSPConfig(ksp_type="gmres", rtol=1e-12,
                                          maxits=300))
        golden = [7.46324, 1.00512, 0.142486, 0.0247617, 0.00523225,
                  0.00128121, 0.000341666, 9.46065e-05, 2.65147e-05,
                  7.45245e-06]
        np.testing.assert_allclose(np.asarray(r.history[:10]), golden,
                                   rtol=2e-5)
