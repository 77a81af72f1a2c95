"""Golden-output parity with the reference's regression outputs.

The reference tests by diffing example output against checked-in
golden files (SURVEY.md §4; e.g. src/ksp/ksp/examples/tutorials/
makefile:317-321 runs ex2 and diffs output/ex2_1.out). These tests
reproduce the same runs and compare residual histories / iteration
counts — "bit-for-iteration" parity in fp64.
"""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system
from petsctpu.pc import make_pc


def tridiag_ex1(n=10):
    """ex1.c: tridiag(-1,2,-1), u=ones, b=A·u."""
    A = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    u = np.ones(n)
    return A, A @ u, u


class TestGoldenOutputs:
    def test_ex2_1_gmres_ilu(self):
        """output/ex2_1.out: -m 5 -n 5, GMRES+ILU(0), refine_always."""
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A)
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-2 / 36, atol=1e-50, cgs_refine="always")
        golden = [3.21109, 0.93268, 0.103515, 0.00787798, 0.000387275]
        assert int(r.its) == 4
        np.testing.assert_allclose(np.asarray(r.history[:5]), golden,
                                   rtol=2e-5)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(r.x) - u), 0.000392701, rtol=1e-4)

    def test_ex2_3_gmres_ssor(self):
        """output/ex2_3.out: default 8x7 grid, -pc_type sor
        -pc_sor_symmetric."""
        A, b, u = ex2_system(8, 7)
        Ad = aij_from_scipy(A)
        pc = make_pc("sor", A=Ad, A_host=A,
                     options=Options({"pc_sor_symmetric": None}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-2 / 72, atol=1e-50, cgs_refine="always")
        golden = [2.98499, 1.13133, 0.575925, 0.108871, 0.0213225,
                  0.00325239, 0.000874208, 0.000179613]
        assert int(r.its) == 7
        np.testing.assert_allclose(np.asarray(r.history[:8]), golden,
                                   rtol=2e-5)

    def test_ex1_1_gmres_jacobi(self):
        """output/ex1_1.out: tridiagonal n=10, GMRES+Jacobi, rtol 1e-5."""
        A, b, u = tridiag_ex1()
        Ad = aij_from_scipy(A)
        pc = make_pc("jacobi", A=Ad)
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-5, atol=1e-50, cgs_refine="always")
        golden = [0.707107, 0.316228, 0.188982, 0.129099, 0.0953463]
        assert int(r.its) == 5
        np.testing.assert_allclose(np.asarray(r.history[:5]), golden,
                                   rtol=2e-5)
        # 5th residual is exact-convergence tiny ("< 1.e-11" in golden)
        assert float(r.history[5]) < 1e-11

    def test_ex1_2_gmres_ssor(self):
        """output/ex1_2.out: tridiagonal n=10, GMRES + symmetric SOR
        (makefile:300-301: -pc_type sor -pc_sor_symmetric), rtol 1e-5."""
        A, b, u = tridiag_ex1()
        Ad = aij_from_scipy(A)
        pc = make_pc("sor", A=Ad, A_host=A,
                     options=Options({"pc_sor_symmetric": None}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-5, atol=1e-50, cgs_refine="always")
        golden = [0.968764, 0.361001, 0.247329, 0.0808915, 0.01289,
                  0.00375064, 0.000294092, 1.40861e-05, 3.48863e-07]
        assert int(r.its) == 8
        np.testing.assert_allclose(np.asarray(r.history[:9]), golden,
                                   rtol=2e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r.x) - u),
                                   4.10316e-07, rtol=1e-3)

    def test_ex2_fbcgs_ilu(self):
        """output/ex2_fbcgs.out (makefile:394-395: -ksp_type fbcgs
        -pc_type ilu on the default 8x7 grid): 4 its, err 0.000319503."""
        A, b, u = ex2_system(8, 7)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A)
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fbcgs",
                      rtol=1e-2 / 72, atol=1e-50)
        assert int(r.its) == 4
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r.x) - u),
                                   0.000319503, rtol=1e-3)

    def test_ex2_1_exact_output_text(self, capsys):
        """Character-level diff of the monitor stream vs output/ex2_1.out
        (the reference's own regression check)."""
        import jax

        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A)
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-2 / 36, atol=1e-50, cgs_refine="always",
                      monitor=True)
        jax.effects_barrier()
        err = np.linalg.norm(np.asarray(r.x) - u)
        out = capsys.readouterr().out
        out += f"Norm of error {err:g} iterations {int(r.its)}\n"
        golden = (
            "  0 KSP Residual norm 3.21109 \n"
            "  1 KSP Residual norm 0.93268 \n"
            "  2 KSP Residual norm 0.103515 \n"
            "  3 KSP Residual norm 0.00787798 \n"
            "  4 KSP Residual norm 0.000387275 \n"
            "Norm of error 0.000392701 iterations 4\n")
        assert out == golden


class TestGoldenSNES:
    def test_snes_ex3_newton_history(self):
        """snes/examples/tutorials/output/ex3_1.out: 1-D BVP
        u'' + u^2 = 6x + x^6 on [0,1], u(0)=0, u(1)=1 (exact u = x^3),
        N=5, initial guess 0.5: function norms 5.41468, 0.295258,
        0.000450229, 1.38967e-09; 3 Newton its; err 1.49752e-10."""
        from petsctpu.snes import snes_solve
        from petsctpu.ksp.common import KSPConfig

        N = 5
        h = 1.0 / (N - 1)
        xs = np.linspace(0.0, 1.0, N)
        FF = jnp.asarray(6.0 * xs + (xs + 1e-12) ** 6)
        d = 1.0 / (h * h)

        def F(u):
            interior = d * (u[:-2] - 2.0 * u[1:-1] + u[2:]) \
                + u[1:-1] ** 2 - FF[1:-1]
            return jnp.concatenate([u[:1], interior, u[-1:] - 1.0])

        x0 = jnp.full(N, 0.5)
        res = snes_solve(F, x0, jac="jvp", rtol=1e-8, atol=1e-50,
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                           maxits=100))
        golden = [5.41468, 0.295258, 0.000450229, 1.38967e-09]
        assert int(res.its) == 3
        np.testing.assert_allclose(np.asarray(res.history[:4]), golden,
                                   rtol=1e-3)
        err = np.linalg.norm(np.asarray(res.x) - xs ** 3)
        assert err < 1e-8

    def test_ex2_2_bjacobi_two_ranks(self):
        """output/ex2_2.out (makefile:322: mpiexec -n 2): the 2-rank
        DEFAULT solver is GMRES + block-Jacobi with per-rank ILU(0) —
        reproduced serially with pc bjacobi, 2 contiguous blocks
        (13/12 rows, the PETSC_DECIDE split of -m 5 -n 5)."""
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        pc = make_pc("bjacobi", A=Ad, A_host=A,
                     options=Options({"pc_bjacobi_blocks": 2}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-2 / 36, atol=1e-50, cgs_refine="always")
        golden = [2.73499, 0.795482, 0.261984, 0.0752998, 0.0230031,
                  0.00521255, 0.00145783, 0.000277319]
        assert int(r.its) == 7
        np.testing.assert_allclose(np.asarray(r.history[:8]), golden,
                                   rtol=2e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(r.x) - u),
                                   0.000292349, rtol=1e-3)


class TestGoldenTS:
    def test_ts_ex1_pseudo_bratu(self):
        """ts/examples/tutorials/output/ex1_1.out: Bratu 4x4 (lambda=6)
        pseudo-timestepping, dt0=0.125, SER increment 1.1
        (TSPseudoDefaultTimeStep): fnorm sequence 0.207564, 0.184718,
        0.160569, ... and dt growth 0.125, 0.1375, 0.169957, ..."""
        from petsctpu.ts.steppers import ts_pseudo, TSConfig

        mx = my = 4
        lam = 6.0
        hx = hy = 1.0 / (mx - 1)
        sc = hx * hy
        hxdhy, hydhx = hx / hy, hy / hx

        mask = np.zeros((my, mx), bool)
        mask[1:-1, 1:-1] = True
        maskj = jnp.asarray(mask.reshape(-1))

        def F(t, xv):
            X = xv.reshape(my, mx)
            u = X[1:-1, 1:-1]
            uxx = (-X[1:-1, 2:] + 2 * u - X[1:-1, :-2]) * hydhx
            uyy = (-X[2:, 1:-1] + 2 * u - X[:-2, 1:-1]) * hxdhy
            f_int = -uxx - uyy + sc * lam * jnp.exp(u)
            out = xv.reshape(my, mx)
            out = jnp.where(mask, 0.0, out)      # boundary rows: f = x
            out = out.at[1:-1, 1:-1].set(f_int)
            return out.reshape(-1)

        # FormInitialGuess (ex1.c): lam/(lam+1)*sqrt(min(min(i,mx-1-i)hx,
        #                                              min(j,my-1-j)hy))
        temp1 = lam / (lam + 1.0)
        u0 = np.zeros((my, mx))
        for j in range(1, my - 1):
            tj = min(j, my - 1 - j) * hy
            for i in range(1, mx - 1):
                u0[j, i] = temp1 * np.sqrt(min(min(i, mx - 1 - i) * hx, tj))
        u0 = jnp.asarray(u0.reshape(-1))

        res = ts_pseudo(F, u0, TSConfig(ts_type="pseudo", dt=0.125,
                                        max_steps=12,
                                        pseudo_fnorm_rtol=1e-10))
        f_golden = [0.207564, 0.184718, 0.160569, 0.135283, 0.109165,
                    0.0827478, 0.0569517, 0.03335, 0.0144859, 0.00341003,
                    0.000212272]
        dt_golden = [0.125, 0.1375, 0.169957, 0.215069, 0.280795,
                     0.382774, 0.555471, 0.887776, 1.66766, 4.22328]
        # dh[n] = dt USED in step n (the golden dt column at TS n)
        fh = np.asarray(res.fnorm_history)
        dh = np.asarray(res.dt_history)
        np.testing.assert_allclose(fh[:11], f_golden, rtol=2e-3)
        np.testing.assert_allclose(dh[:10], dt_golden, rtol=2e-3)


class TestGoldenSNESVariants:
    """snes ex5_5_* variant goldens: Bratu 81x81, lambda=6
    (makefile:344 CSD_BASIC_COMMAND_LINE)."""

    def _setup(self):
        from petsctpu.dm import DA
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        da = DA((81, 81))
        return bratu_residual(da, lam=6.0), bratu_initial_guess(da, 6.0)

    def test_ex5_5_nrichardson(self):
        """output/ex5_5_nrichardson.out: L2 line search, digit-exact."""
        from petsctpu.snes.api import snes_nrichardson
        F, x0 = self._setup()
        r = snes_nrichardson(F, x0, maxits=8, rtol=1e-12)
        golden = [1.11127, 0.693019, 0.550529, 0.468878, 0.413831,
                  0.373283, 0.342081, 0.316999, 0.296369]
        np.testing.assert_allclose(np.asarray(r.history[:9]), golden,
                                   rtol=2e-5)

    def test_ex5_5_ncg_fr(self):
        """output/ex5_5_ncg.out: -snes_ncg_type fr, CP line search
        (linear order, one iteration), digit-exact."""
        from petsctpu.snes.fas import snes_ncg
        F, x0 = self._setup()
        r = snes_ncg(F, x0, beta_type="fr", maxits=8, rtol=1e-12)
        golden = [1.11127, 0.886518, 0.718206, 0.591367, 0.540892,
                  0.466458, 0.435514, 0.386243, 0.363351]
        np.testing.assert_allclose(np.asarray(r.history[:9]), golden,
                                   rtol=2e-5)

    def test_ex5_5_qn(self):
        """output/ex5_5_qn.out: -snes_type qn -snes_linesearch_type cp
        -snes_qn_m 10 (defaults: LBFGS + Shanno scaling + Powell
        restart), digit-exact."""
        from petsctpu.snes.variants import snes_qn
        F, x0 = self._setup()
        r = snes_qn(F, x0, history_len=10, maxits=8, rtol=1e-12)
        golden = [1.11127, 0.886518, 0.718213, 0.591377, 0.540899,
                  0.466467, 0.435522, 0.386251, 0.363358]
        np.testing.assert_allclose(np.asarray(r.history[:9]), golden,
                                   rtol=2e-5)

    def test_ex5_5_ngmres(self):
        """output/ex5_5_ngmres.out: -snes_type ngmres -snes_ngmres_m 10
        (L2 Richardson step + Gram-matrix minimization + DIFFERENCE
        selection/restart), digit-exact."""
        from petsctpu.snes.variants import snes_ngmres
        F, x0 = self._setup()
        r = snes_ngmres(F, x0, msize=10, maxits=7, rtol=1e-12)
        golden = [1.11127, 0.693019, 0.498708, 0.381244, 0.311619,
                  0.25912, 0.222688, 0.192923]
        np.testing.assert_allclose(np.asarray(r.history[:8]), golden,
                                   rtol=2e-5)

    def test_ts_ex3_ssp_heat(self):
        """ts/examples/tutorials/output/ex3_1.out: 1-D heat equation
        m=60 (truncated-stencil ends), u0 = sin(6πx)+3sin(2πx),
        -ts_type ssp (default RKS2, 5 stages) -ts_dt 0.0005: 2-norm
        errors vs the analytic solution at steps 1..10."""
        from petsctpu.ts.steppers import ts_solve, TSConfig
        import scipy.sparse as sp

        m = 60
        h = 1.0 / (m - 1)
        A = sp.diags([np.ones(m - 1), -2.0 * np.ones(m),
                      np.ones(m - 1)], [-1, 0, 1]).tolil() / h ** 2
        # ex3.c RHSMatrixHeat: boundary rows are identity (du/dt = u)
        A[0, :] = 0.0
        A[0, 0] = 1.0
        A[m - 1, :] = 0.0
        A[m - 1, m - 1] = 1.0
        Ad = jnp.asarray(sp.csr_matrix(A).toarray())

        def rhs(t, u):
            return Ad @ u

        xs = h * np.arange(m)
        u0 = jnp.asarray(np.sin(6 * np.pi * xs) + 3.0 * np.sin(2 * np.pi * xs))

        def exact(t):
            return (np.sin(6 * np.pi * xs) * np.exp(-36 * np.pi ** 2 * t)
                    + 3 * np.sin(2 * np.pi * xs) * np.exp(-4 * np.pi ** 2 * t))

        golden = [0.00103714, 0.00173865, 0.00218619, 0.00244382,
                  0.00256155, 0.0025782, 0.00252361, 0.00242114,
                  0.00228786, 0.00213706]
        u = u0
        errs = []
        for k in range(10):
            r = ts_solve(rhs, u, TSConfig(ts_type="ssp", ssp_type="rks2",
                                          ssp_nstages=5, dt=0.0005,
                                          max_steps=1, max_time=1.0))
            u = r.u
            # ex3.c:393 monitors the h-scaled (continuum L2) norm
            errs.append(np.sqrt(h) * np.linalg.norm(np.asarray(u)
                                                    - exact(0.0005 * (k + 1))))
        np.testing.assert_allclose(errs, golden, rtol=2e-4)


class TestGoldenSNESTR:
    def test_snes_ex2_2_newtontr_history(self):
        """snes/examples/tutorials/output/ex2_2.out (runex2_2:
        -snes_type newtontr): same 1-D BVP as ex3, reference tr.c
        trust region accepts the full Newton steps — norms 5.41468,
        0.295258, 0.000450229, 1.38967e-09; 3 its; err 1.49752e-10."""
        from petsctpu.snes import snes_tr
        from petsctpu.ksp.common import KSPConfig

        N = 5
        h = 1.0 / (N - 1)
        xs = np.linspace(0.0, 1.0, N)
        FF = jnp.asarray(6.0 * xs + (xs + 1e-12) ** 6)
        d = 1.0 / (h * h)

        def F(u):
            interior = d * (u[:-2] - 2.0 * u[1:-1] + u[2:]) \
                + u[1:-1] ** 2 - FF[1:-1]
            return jnp.concatenate([u[:1], interior, u[-1:] - 1.0])

        res = snes_tr(F, jnp.full(N, 0.5), jac="jvp", rtol=1e-8,
                      atol=1e-50,
                      ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                        maxits=100))
        golden = [5.41468, 0.295258, 0.000450229, 1.38967e-09]
        assert int(res.its) == 3
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.history[:4]), golden,
                                   rtol=1e-3)
        err = np.linalg.norm(np.asarray(res.x) - xs ** 3)
        np.testing.assert_allclose(err, 1.49752e-10, rtol=1e-3)

    def test_tr_radius_restricts_then_recovers(self):
        """With a tiny delta0 the first steps are radius-limited but
        the radius grows (delta3=2 expansions) and the solve still
        converges — the tr.c inner shrink/expand machinery."""
        from petsctpu.snes import snes_tr

        def F(u):
            return jnp.stack([u[0] ** 2 - 1.0, u[1] ** 2 - 4.0])

        res = snes_tr(F, jnp.asarray([3.0, 5.0]), jac="jvp",
                      delta0=0.01, rtol=1e-10, maxits=60)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0],
                                   atol=1e-8)


class TestGoldenSNESEx1:
    def test_snes_ex1_1_two_var_system(self):
        """snes/examples/tutorials/output/ex1_1.out (runex1): 2-var
        system x²+xy=3, xy+y²=6 from x0=(.5,.5), PCNONE + GMRES(rtol
        1e-4, maxits 20) set in ex1.c:96-97 — bt line search damps the
        first two steps: norms 6.04152, 4.78676, 2.98646, 0.230624,
        0.00193631, 1.43559e-07, <1e-11; 6 its."""
        from petsctpu.snes import snes_solve
        from petsctpu.ksp.common import KSPConfig

        def F(x):
            return jnp.stack([x[0] * x[0] + x[0] * x[1] - 3.0,
                              x[0] * x[1] + x[1] * x[1] - 6.0])

        r = snes_solve(F, jnp.full(2, 0.5), jac="jvp", rtol=1e-8,
                       atol=1e-50,
                       ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-4,
                                         maxits=20, cgs_refine="always"))
        golden = [6.04152, 4.78676, 2.98646, 0.230624, 0.00193631,
                  1.43559e-07]
        assert int(r.its) == 6
        np.testing.assert_allclose(np.asarray(r.history[:6]), golden,
                                   rtol=2e-5)
        assert float(r.history[6]) < 1e-11


class TestGoldenSNESPostCheck:
    def test_snes_ex3_4_post_check_iterates(self):
        """snes/examples/tutorials/output/ex3_4.out (runex3_4
        -post_check_iterates): the PostCheck hook
        (SNESLineSearchSetPostCheck, ex3.c PostCheck) halves entries
        whose relative change exceeds tolerance 1 — the modified
        candidate raises the iteration-2 norm to 0.303701 and the
        solve still converges: 5.41468, 0.295258, 0.303701,
        7.24709e-05, <1e-11."""
        from petsctpu.snes import snes_solve
        from petsctpu.ksp.common import KSPConfig

        N = 5
        xs = np.linspace(0.0, 1.0, N)
        d = (N - 1.0) ** 2
        FF = jnp.asarray(6.0 * xs + (xs + 1e-12) ** 6)

        def F(u):
            interior = d * (u[:-2] - 2.0 * u[1:-1] + u[2:]) \
                + u[1:-1] ** 2 - FF[1:-1]
            return jnp.concatenate([u[:1], interior, u[-1:] - 1.0])

        tol = 1.0

        def post_check(its, x_last, dx, x):
            rdiff = jnp.where(jnp.abs(x) == 0, 2 * tol,
                              jnp.abs((x - x_last)
                                      / jnp.where(x == 0, 1.0, x)))
            alter = (rdiff > tol) & (its > 0)
            return jnp.where(alter, 0.5 * (x + x_last), x)

        r = snes_solve(F, jnp.full(N, 0.5), jac="jvp", rtol=1e-8,
                       atol=1e-50, post_check=post_check,
                       ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-4,
                                         maxits=20,
                                         cgs_refine="always"))
        golden = [5.41468, 0.295258, 0.303701, 7.24709e-05]
        assert int(r.its) == 4
        np.testing.assert_allclose(np.asarray(r.history[:4]), golden,
                                   rtol=2e-5)
        assert float(r.history[4]) < 1e-10


class TestGoldenSNESEx14:
    def test_snes_ex14_3d_bratu(self):
        """snes/examples/tutorials/output/ex14_1.out (runex14): 3-D
        solid-fuel-ignition (Bratu) −Δu − λeᵘ = 0 on a 4³ DMDA star
        stencil, λ=6 (ex14.c FormFunction: hxhyhz-scaled stencil,
        FormInitialGuess distance-to-boundary profile): norms
        0.368723, 0.0202824, 4.38259e-05, 2.078e-10; 3 its; final
        fnorm 2.07815e-10 — digit-exact."""
        from petsctpu.snes import snes_solve
        from petsctpu.ksp.common import KSPConfig

        M = 4
        h = 1.0 / (M - 1)
        lam = 6.0
        sc = h * h * h * lam
        w = h  # hx·hz/hy = h for the uniform cube

        def F(uflat):
            X = uflat.reshape(M, M, M)
            P = jnp.pad(X, 1)
            C = X
            east, west = P[1:-1, 1:-1, 2:], P[1:-1, 1:-1, :-2]
            north, south = P[1:-1, 2:, 1:-1], P[1:-1, :-2, 1:-1]
            up, down = P[2:, 1:-1, 1:-1], P[:-2, 1:-1, 1:-1]
            lap = ((-east + 2 * C - west) + (-north + 2 * C - south)
                   + (-up + 2 * C - down)) * w
            interior = lap - sc * jnp.exp(C)
            k, j, i = jnp.meshgrid(jnp.arange(M), jnp.arange(M),
                                   jnp.arange(M), indexing="ij")
            bnd = ((i == 0) | (i == M - 1) | (j == 0) | (j == M - 1)
                   | (k == 0) | (k == M - 1))
            return jnp.where(bnd, X, interior).reshape(-1)

        temp1 = lam / (lam + 1.0)
        d1 = np.minimum(np.arange(M), M - 1 - np.arange(M)) * h
        k, j, i = np.meshgrid(d1, d1, d1, indexing="ij")
        X0 = temp1 * np.sqrt(np.minimum(np.minimum(i, j), k))
        bi = np.zeros((M, M, M), bool)
        bi[0] = bi[-1] = True
        bi[:, 0] = bi[:, -1] = True
        bi[:, :, 0] = bi[:, :, -1] = True
        X0[bi] = 0.0

        r = snes_solve(F, jnp.asarray(X0.reshape(-1)), jac="jvp",
                       rtol=1e-8, atol=1e-50,
                       ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                         maxits=300,
                                         cgs_refine="always"))
        golden = [0.368723, 0.0202824, 4.38259e-05, 2.078e-10]
        assert int(r.its) == 3
        np.testing.assert_allclose(np.asarray(r.history[:4]), golden,
                                   rtol=2e-4)
        np.testing.assert_allclose(float(r.fnorm), 2.07815e-10,
                                   rtol=1e-4)
