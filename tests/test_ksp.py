import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.errors import ConvergedReason
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.pc import make_pc


def _sys(m=10, n=10):
    A, b, u = ex2_system(m, n)
    return A, aij_from_scipy(A), jnp.asarray(b), u


class TestGoldenEx2:
    """Reference golden output parity: src/ksp/ksp/examples/tutorials/
    output/ex2_1.out — GMRES(30) + ILU(0), rtol 1e-2/36, must converge
    in exactly 4 iterations with matching residual history."""

    def test_gmres_ilu_matches_reference(self):
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                        rtol=1e-2 / 36, atol=1e-50, cgs_refine="always")
        assert int(res.its) == 4
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
        golden = [3.21109, 0.93268, 0.103515, 0.00787798, 0.000387275]
        np.testing.assert_allclose(np.asarray(res.history[:5]), golden,
                                   rtol=1e-5)
        err = np.linalg.norm(np.asarray(res.x) - u)
        np.testing.assert_allclose(err, 0.000392701, rtol=1e-4)


class TestKSPTypes:
    def test_cg_jacobi(self):
        A, Ad, b, u = _sys()
        pc = make_pc("jacobi", A=Ad)
        res = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-8)
        # residual history should be monotone-ish and finite
        h = np.asarray(res.history[: int(res.its) + 1])
        assert np.all(np.isfinite(h))

    def test_pipecg_matches_cg(self):
        A, Ad, b, u = _sys()
        pc = make_pc("jacobi", A=Ad)
        r1 = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8)
        r2 = ksp_solve(Ad, b, pc=pc, ksp_type="pipecg", rtol=1e-8)
        assert r2.converged
        assert abs(int(r1.its) - int(r2.its)) <= 1
        np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                                   atol=1e-7)

    def test_bcgs_nonsymmetric(self):
        # advection-diffusion: Laplacian + skew part
        A = laplacian_2d(8, 8).tolil()
        n = A.shape[0]
        for i in range(n - 1):
            A[i, i + 1] += 0.3
        A = A.tocsr()
        Ad = aij_from_scipy(A)
        b = jnp.asarray(np.ones(n))
        res = ksp_solve(Ad, b, pc=make_pc("jacobi", A=Ad), ksp_type="bcgs",
                        rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x),
                                   spla.spsolve(A, np.ones(n)), atol=1e-7)

    def test_gmres_nonsymmetric(self):
        A = laplacian_2d(8, 8).tolil()
        n = A.shape[0]
        for i in range(n - 1):
            A[i, i + 1] += 0.3
        A = A.tocsr()
        Ad = aij_from_scipy(A)
        b = jnp.asarray(np.ones(n))
        res = ksp_solve(Ad, b, pc=make_pc("jacobi", A=Ad), ksp_type="gmres",
                        rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x),
                                   spla.spsolve(A, np.ones(n)), atol=1e-7)

    def test_fgmres(self):
        A, Ad, b, u = _sys()
        res = ksp_solve(Ad, b, pc=make_pc("jacobi", A=Ad), ksp_type="fgmres",
                        rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_chebyshev(self):
        A, Ad, b, u = _sys(6, 6)
        pc = make_pc("jacobi", A=Ad)
        res = ksp_solve(Ad, b, pc=pc, ksp_type="chebyshev", rtol=1e-8,
                        maxits=400)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6)

    def test_richardson_sor(self):
        A, Ad, b, u = _sys(6, 6)
        pc = make_pc("sor", A=Ad, A_host=A)
        res = ksp_solve(Ad, b, pc=pc, ksp_type="richardson", rtol=1e-9,
                        maxits=500)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_minres_indefinite(self):
        # symmetric indefinite: Laplacian shifted to straddle zero
        A = laplacian_2d(6, 6) - 3.0 * sp.eye(36)
        Ad = aij_from_scipy(A.tocsr())
        rng = np.random.default_rng(3)
        xex = rng.standard_normal(36)
        b = jnp.asarray(A @ xex)
        res = ksp_solve(Ad, b, pc=None, ksp_type="minres", rtol=1e-10,
                        maxits=300)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-6)

    def test_lsqr_rectangular(self):
        rng = np.random.default_rng(4)
        A = sp.random(30, 12, density=0.4, random_state=rng, format="csr")
        A = A + sp.vstack([sp.eye(12), sp.csr_matrix((18, 12))]).tocsr()
        Ad = aij_from_scipy(A)
        b = rng.standard_normal(30)
        res = ksp_solve(Ad, jnp.asarray(b), ksp_type="lsqr", rtol=1e-12,
                        maxits=200)
        xref = spla.lsqr(A, b, atol=1e-14, btol=1e-14)[0]
        np.testing.assert_allclose(np.asarray(res.x), xref, atol=1e-6)

    def test_preonly_lu_exact(self):
        A, Ad, b, u = _sys(7, 9)
        pc = make_pc("lu", A=Ad, A_host=A)
        res = ksp_solve(Ad, b, pc=pc, ksp_type="preonly")
        assert int(res.reason) == ConvergedReason.CONVERGED_ITS
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-10)

    def test_maxits_divergence_reason(self):
        A, Ad, b, u = _sys()
        res = ksp_solve(Ad, b, pc=None, ksp_type="cg", rtol=1e-14, maxits=3)
        assert int(res.reason) == ConvergedReason.DIVERGED_ITS
        assert int(res.its) == 3

    def test_cgs_and_bicg(self):
        A, Ad, b, u = _sys(6, 6)
        pc = make_pc("jacobi", A=Ad)
        for t in ("cgs", "bicg"):
            res = ksp_solve(Ad, b, pc=pc, ksp_type=t, rtol=1e-9)
            assert res.converged, t
            np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6,
                                       err_msg=t)


class TestKSPObject:
    def test_options_driven(self):
        from petsctpu.core.options import Options
        from petsctpu.ksp import KSP

        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        opts = Options({"ksp_type": "cg", "pc_type": "ilu",
                        "ksp_rtol": "1e-10"})
        ksp = KSP(options=opts).set_operators(Ad, A_host=A)
        res = ksp.solve(jnp.asarray(b))
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-8)
        assert opts.unused() == []


class TestMonitorTrueResidual:
    def test_true_residual_stream_matches_actual(self, capsys):
        """-ksp_monitor_true_residual (KSPMonitorTrueResidualNorm):
        the streamed true residual at the final iteration equals the
        recomputed ‖b − Ax‖."""
        from petsctpu.models import ex2_system
        from petsctpu.pc import make_pc

        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        pc = make_pc("ilu", A=Ad, A_host=A)
        import jax as _jax

        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                      rtol=1e-2 / 36, atol=1e-50, monitor_true=True)
        _jax.effects_barrier()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == int(r.its) + 1
        assert "true resid norm" in out[0]
        last_true = float(out[-1].split("true resid norm")[1].split()[0])
        actual = float(np.linalg.norm(
            b - A @ np.asarray(r.x)))
        np.testing.assert_allclose(last_true, actual, rtol=1e-6)
