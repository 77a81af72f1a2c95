import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.pc import make_pc
from petsctpu.pc.asm import increase_overlap, make_asm
from petsctpu.pc.fieldsplit import make_fieldsplit
from petsctpu.vec.indexset import IS


class TestASM:
    def test_overlap_growth(self):
        A = laplacian_2d(5, 5)
        base = np.arange(5)
        ext = increase_overlap(A, base, 1)
        assert set(base).issubset(set(ext))
        assert len(ext) > len(base)

    def test_asm_solves(self):
        A, b, u = ex2_system(10, 10)
        Ad = aij_from_scipy(A)
        for restricted in (True, False):
            pc = make_asm(A, nblocks=4, overlap=1, restricted=restricted)
            res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                            rtol=1e-10)
            assert res.converged, restricted
            np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)

    def test_asm_beats_bjacobi_its(self):
        """Overlap should not be worse than no overlap (block jacobi)."""
        A, b, u = ex2_system(12, 12)
        Ad = aij_from_scipy(A)
        pc_ovl = make_asm(A, nblocks=4, overlap=2, restricted=True)
        pc_novl = make_asm(A, nblocks=4, overlap=0, restricted=True)
        r1 = ksp_solve(Ad, jnp.asarray(b), pc=pc_ovl, ksp_type="gmres",
                       rtol=1e-8)
        r0 = ksp_solve(Ad, jnp.asarray(b), pc=pc_novl, ksp_type="gmres",
                       rtol=1e-8)
        assert int(r1.its) <= int(r0.its)

    def test_asm_lu_subsolver(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        pc = make_asm(A, nblocks=3, overlap=1, sub_pc="lu")
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="gmres",
                        rtol=1e-10)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-7)


def stokes_like(nu=1.0, m=8):
    """Saddle-point system [[A, B^T],[B, -eps I]]."""
    rng = np.random.default_rng(0)
    A = (laplacian_2d(m, m) * nu).tocsr()
    n = A.shape[0]
    k = n // 2
    B = sp.random(k, n, density=0.1, random_state=rng, format="csr")
    B = B + sp.eye(k, n) * 0.5
    C = -1e-3 * sp.eye(k)
    K = sp.bmat([[A, B.T], [B, C]]).tocsr()
    return K, n, k


def coupled_elliptic(m=8, eps=0.1):
    """Two Laplacian fields with weak off-diagonal coupling — the
    natural target for additive/multiplicative splits."""
    rng = np.random.default_rng(3)
    L = laplacian_2d(m, m)
    n = L.shape[0]
    C = eps * sp.random(n, n, density=0.05, random_state=rng, format="csr")
    K = sp.bmat([[L, C], [C.T, L + sp.eye(n)]]).tocsr()
    return K, n


class TestFieldSplit:
    def _solve(self, fs_type, schur_fact="full", ksp_type="fgmres"):
        K, n, k = stokes_like()
        fields = [IS.stride(n), IS.stride(k, first=n)]
        opts = Options({"pc_fieldsplit_type": fs_type,
                        "pc_fieldsplit_schur_fact_type": schur_fact,
                        "pc_fieldsplit_fields": fields})
        pc = make_fieldsplit(K, fields, options=opts)
        rng = np.random.default_rng(1)
        xex = rng.standard_normal(n + k)
        b = jnp.asarray(K @ xex)
        Kd = aij_from_scipy(K)
        res = ksp_solve(Kd, b, pc=pc, ksp_type=ksp_type, rtol=1e-10,
                        maxits=300)
        return res, xex

    def _solve_coupled(self, fs_type):
        K, n = coupled_elliptic()
        fields = [IS.stride(n), IS.stride(n, first=n)]
        opts = Options({"pc_fieldsplit_type": fs_type,
                        "pc_fieldsplit_fields": fields})
        pc = make_fieldsplit(K, fields, options=opts)
        rng = np.random.default_rng(2)
        xex = rng.standard_normal(2 * n)
        b = jnp.asarray(K @ xex)
        Kd = aij_from_scipy(K)
        res = ksp_solve(Kd, b, pc=pc, ksp_type="fgmres", rtol=1e-10,
                        maxits=200)
        return res, xex

    def test_additive(self):
        res, xex = self._solve_coupled("additive")
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-6)

    def test_multiplicative(self):
        res, xex = self._solve_coupled("multiplicative")
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-6)

    def test_schur_full_few_iterations(self):
        """Exact A00 solve + good Schur solve → outer converges in ~1-3."""
        res, xex = self._solve("schur", "full")
        assert res.converged
        assert int(res.its) <= 5, int(res.its)
        np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-5)

    def test_schur_variants(self):
        for fact in ("diag", "lower", "upper"):
            res, xex = self._solve("schur", fact)
            assert res.converged, fact
            np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-5,
                                       err_msg=fact)


class TestCompositeKSP:
    def test_composite_additive_and_multiplicative(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        for mode in ("additive", "multiplicative"):
            pc = make_pc("composite", A=Ad, A_host=A,
                         options=Options({"pc_composite_type": mode,
                                          "pc_composite_pcs": "jacobi,sor"}))
            res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                            rtol=1e-9)
            assert res.converged, mode
            np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6,
                                       err_msg=mode)

    def test_ksp_pc(self):
        A, b, u = ex2_system(8, 8)
        Ad = aij_from_scipy(A)
        pc = make_pc("ksp", A=Ad, A_host=A,
                     options=Options({"ksp_ksp_type": "cg",
                                      "ksp_ksp_rtol": "1e-3",
                                      "ksp_pc_type": "jacobi"}))
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                        rtol=1e-9)
        assert res.converged
        assert int(res.its) <= 12
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-6)

    def test_shell_pc(self):
        from petsctpu.pc.composite import ShellPC
        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        dinv = 1.0 / Ad.diagonal()
        pc = ShellPC(ctx=dinv, apply_fn=lambda d, x: d * x)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg", rtol=1e-9)
        assert res.converged

    def test_redundant_is_exact(self):
        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        pc = make_pc("redundant", A=Ad, A_host=A)
        res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="preonly")
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-10)
