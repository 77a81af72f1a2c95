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


class TestEx19FieldSplit:
    def test_ex19_6_fieldsplit_multiplicative(self):
        """output/ex19_6.out (runex19_6: -pc_type fieldsplit
        -ksp_type fgmres -da_refine 1, 1 rank): 7×7 cavity, 4-field
        split (u,v,ω,T strided ISs), the reference's DEFAULT
        multiplicative composition with inner ILU — first linear
        solve's 12 monitor lines digit-exact (0.146194 … 5.43836e-07,
        11 its), SNES norms 0.146194 → 2.50119e-05 → 1.093e-10."""
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc

        mx = my = 7
        F = cavity_residual(mx, my)
        x = cavity_initial_guess(mx, my)
        patt = cavity_jacobian_pattern(mx, my)
        plan = ColoredJacobian.from_sparsity(patt, aij_from_scipy(patt))
        N = mx * my * 4
        fields = [np.arange(f, N, 4) for f in range(4)]

        def aij_to_scipy(J):
            m, n = J.shape
            cols = np.asarray(J.cols)
            vals = np.asarray(J.vals)
            rows = np.repeat(np.arange(m), cols.shape[1])
            M = sp.csr_matrix((vals.ravel(), (rows, cols.ravel())),
                              shape=(m, n))
            M.eliminate_zeros()
            return M

        snes_golden = [0.146194, 2.50119e-05, 1.093e-10]
        ksp0_golden = [0.146194, 0.0554997, 0.0103331, 0.00349351,
                       0.00162771, 0.000420559, 0.000131423,
                       4.9738e-05, 1.91653e-05, 5.05572e-06,
                       1.51319e-06, 5.43836e-07]
        for newton_it in range(2):
            Fx = F(x)
            fnorm = float(jnp.linalg.norm(Fx))
            np.testing.assert_allclose(fnorm, snes_golden[newton_it],
                                       rtol=2e-5)
            J = plan.assemble(F, x, Fx)
            opts = Options({"pc_fieldsplit_fields": fields,
                            "pc_fieldsplit_type": "multiplicative"})
            pc = make_pc("fieldsplit", A=J, A_host=aij_to_scipy(J),
                         options=opts)
            r = ksp_solve(J, Fx, pc=pc, ksp_type="fgmres", rtol=1e-5,
                          maxits=200)
            if newton_it == 0:
                assert int(r.its) == 11
                np.testing.assert_allclose(np.asarray(r.history[:12]),
                                           ksp0_golden, rtol=2e-5)
            x = x - r.x
        np.testing.assert_allclose(float(jnp.linalg.norm(F(x))),
                                   snes_golden[2], rtol=1e-3)


class TestEx19FieldSplitVariants:
    """runex19_fieldsplit_2/3/4 (snes makefile:638-652, 1 rank, 4×4
    default grid): grouped splits — fields (u,v,ω)=0,1,2 as ONE split
    and T=3 as the other (-pc_fieldsplit_0_fields 0,1,2) — additive
    with ILU subs / additive with LU subs / SCHUR-full with LU subs.
    Goldens verified current against the reference-source oracle;
    monitor streams digit-exact."""

    def _newton(self, fs_opts, ksp0_golden, snes_golden, its0):
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.fieldsplit import make_fieldsplit

        mx = my = 4
        F = cavity_residual(mx, my)
        x = cavity_initial_guess(mx, my)
        patt = cavity_jacobian_pattern(mx, my)
        plan = ColoredJacobian.from_sparsity(patt, aij_from_scipy(patt))
        N = mx * my * 4
        is0 = np.sort(np.concatenate([np.arange(f, N, 4)
                                      for f in (0, 1, 2)]))
        is1 = np.arange(3, N, 4)

        P = sp.csr_matrix(patt)
        row_nnz = np.diff(P.indptr)

        def aij_to_scipy(J):
            # reconstruct WITH the DMDA structural zeros (fdda.c zero-
            # fills every stencil slot; the split ILU(0) patterns
            # depend on them)
            vals = np.asarray(J.vals)
            mask = np.arange(vals.shape[1])[None, :] < row_nnz[:, None]
            return sp.csr_matrix((vals[mask], P.indices.copy(),
                                  P.indptr.copy()), shape=P.shape)

        for newton_it in range(2):
            Fx = F(x)
            fnorm = float(jnp.linalg.norm(Fx))
            np.testing.assert_allclose(fnorm, snes_golden[newton_it],
                                       rtol=2e-5)
            J = plan.assemble(F, x, Fx)
            pc = make_fieldsplit(aij_to_scipy(J), [is0, is1],
                                 options=Options(dict(fs_opts)),
                                 A_dev=J)
            r = ksp_solve(J, Fx, pc=pc, ksp_type="fgmres", rtol=1e-5,
                          maxits=200)
            if newton_it == 0:
                assert int(r.its) == its0, int(r.its)
                h = np.asarray(r.history[:its0 + 1])
                for hv, gv in zip(h, ksp0_golden):
                    if gv <= 1e-11:      # golden prints "< 1.e-11"
                        assert hv < 1e-11
                    else:
                        np.testing.assert_allclose(hv, gv, rtol=2e-5)
            x = x - r.x
        np.testing.assert_allclose(float(jnp.linalg.norm(F(x))),
                                   snes_golden[2], rtol=2e-3,
                                   atol=1e-11)

    def test_ex19_fieldsplit_2_additive_ilu(self):
        """output/ex19_fieldsplit_2.out (subs at fieldsplit defaults:
        preonly+ILU(0))."""
        self._newton(
            {"pc_fieldsplit_type": "additive",
             "fieldsplit_0_pc_type": "ilu",
             "fieldsplit_1_pc_type": "ilu"},
            [0.239155, 0.0397523, 0.00401484, 0.000749174, 8.36744e-05,
             9.68825e-06, 2.05679e-06],
            [0.239155, 6.81704e-05, 5.940e-10], 6)

    def test_ex19_fieldsplit_3_additive_lu(self):
        """output/ex19_fieldsplit_3.out."""
        self._newton(
            {"pc_fieldsplit_type": "additive",
             "fieldsplit_0_pc_type": "lu",
             "fieldsplit_1_pc_type": "lu"},
            [0.239155, 0.00208502, 0.000317113, 2.87706e-07],
            [0.239155, 6.81924e-05, 2.898e-11], 3)

    def test_ex19_fieldsplit_4_schur_lu(self):
        """output/ex19_fieldsplit_4.out: full Schur factorization,
        LU(A00) + GMRES-on-S preconditioned by LU(A11) — one outer
        iteration to < 1e-11."""
        self._newton(
            {"pc_fieldsplit_type": "schur",
             "fieldsplit_0_pc_type": "lu",
             "fieldsplit_1_pc_type": "lu"},
            [0.239155, 1e-12],
            [0.239155, 6.81969e-05, 1e-12], 1)


class TestEx19CompositeFieldSplit:
    def test_ex19_composite_fieldsplit(self):
        """runex19_composite_fieldsplit (snes makefile:663-667, 1
        rank): PCCOMPOSITE MULTIPLICATIVE of [fieldsplit(additive,
        grouped 0,1,2|3, ILU subs), none] — the none stage adds the
        raw residual (y += b − A·y). output/
        ex19_composite_fieldsplit.out (oracle-verified current);
        both Newton iterations' KSP streams digit-exact."""
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.composite import CompositePC
        from petsctpu.pc.fieldsplit import make_fieldsplit
        from petsctpu.pc.simple import NonePC

        mx = my = 4
        F = cavity_residual(mx, my)
        x = cavity_initial_guess(mx, my)
        patt = cavity_jacobian_pattern(mx, my)
        plan = ColoredJacobian.from_sparsity(patt, aij_from_scipy(patt))
        N = mx * my * 4
        is0 = np.sort(np.concatenate([np.arange(f, N, 4)
                                      for f in (0, 1, 2)]))
        is1 = np.arange(3, N, 4)
        P = sp.csr_matrix(patt)
        row_nnz = np.diff(P.indptr)
        snes_golden = [0.239155, 6.8147e-05, 5.629e-10]
        ksp_goldens = [
            [0.239155, 0.141937, 0.00716688, 0.00117796, 0.000241841,
             3.05084e-05, 3.12138e-06, 7.29294e-07],
            [6.8147e-05, 1.16666e-05, 9.79903e-07, 1.19278e-07,
             1.78204e-08, 3.2221e-09, 5.640e-10],
        ]
        for newton_it in range(2):
            Fx = F(x)
            np.testing.assert_allclose(float(jnp.linalg.norm(Fx)),
                                       snes_golden[newton_it], rtol=2e-5)
            J = plan.assemble(F, x, Fx)
            vals = np.asarray(J.vals)
            mask = np.arange(vals.shape[1])[None, :] < row_nnz[:, None]
            Jh = sp.csr_matrix((vals[mask], P.indices.copy(),
                                P.indptr.copy()), shape=P.shape)
            fs = make_fieldsplit(Jh, [is0, is1], options=Options(
                {"pc_fieldsplit_type": "additive",
                 "fieldsplit_0_pc_type": "ilu",
                 "fieldsplit_1_pc_type": "ilu"}), A_dev=J)
            pc = CompositePC((fs, NonePC()), J, "multiplicative")
            r = ksp_solve(J, Fx, pc=pc, ksp_type="fgmres", rtol=1e-5,
                          maxits=200)
            g = np.asarray(ksp_goldens[newton_it])
            assert int(r.its) == len(g) - 1, int(r.its)
            h = np.asarray(r.history[:len(g)])
            # monitor_short prints %5.3e (4 digits) below 1e-9
            np.testing.assert_allclose(h[g >= 1e-9], g[g >= 1e-9],
                                       rtol=2e-5)
            np.testing.assert_allclose(h[g < 1e-9], g[g < 1e-9],
                                       rtol=5e-4)
            x = x - r.x
        np.testing.assert_allclose(float(jnp.linalg.norm(F(x))),
                                   snes_golden[2], rtol=2e-3)


class TestEx19CompositeFieldSplitBJacobi:
    def test_ex19_composite_fieldsplit_bjacobi(self):
        """runex19_composite_fieldsplit_bjacobi (makefile:668-672):
        PCCOMPOSITE MULTIPLICATIVE of [fieldsplit(additive, grouped
        0,1,2|3, ILU subs), bjacobi(16 blocks, LU subs)] on the 4x4
        cavity. Golden oracle-verified current; both Newton
        iterations' fgmres streams digit-exact."""
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.asm import make_asm
        from petsctpu.pc.composite import CompositePC
        from petsctpu.pc.fieldsplit import make_fieldsplit

        mx = my = 4
        F = cavity_residual(mx, my)
        x = cavity_initial_guess(mx, my)
        patt = cavity_jacobian_pattern(mx, my)
        plan = ColoredJacobian.from_sparsity(patt, aij_from_scipy(patt))
        N = mx * my * 4
        is0 = np.sort(np.concatenate([np.arange(f, N, 4)
                                      for f in (0, 1, 2)]))
        is1 = np.arange(3, N, 4)
        P = sp.csr_matrix(patt)
        row_nnz = np.diff(P.indptr)
        snes_golden = [0.239155, 6.82259e-05, 5.561e-10]
        ksp_goldens = [
            [0.239155, 0.0149055, 0.00158202, 8.52568e-05, 9.95685e-06,
             6.06096e-07],
            [6.82259e-05, 1.4852e-06, 1.17328e-07, 8.85229e-09,
             5.572e-10],
        ]
        for newton_it in range(2):
            Fx = F(x)
            np.testing.assert_allclose(float(jnp.linalg.norm(Fx)),
                                       snes_golden[newton_it], rtol=2e-5)
            J = plan.assemble(F, x, Fx)
            vals = np.asarray(J.vals)
            mask = np.arange(vals.shape[1])[None, :] < row_nnz[:, None]
            Jh = sp.csr_matrix((vals[mask], P.indices.copy(),
                                P.indptr.copy()), shape=P.shape)
            fs = make_fieldsplit(Jh, [is0, is1], options=Options(
                {"pc_fieldsplit_type": "additive",
                 "fieldsplit_0_pc_type": "ilu",
                 "fieldsplit_1_pc_type": "ilu"}), A_dev=J)
            bj = make_asm(Jh, nblocks=16, overlap=0, restricted=False,
                          sub_pc="lu")
            pc = CompositePC((fs, bj), J, "multiplicative")
            r = ksp_solve(J, Fx, pc=pc, ksp_type="fgmres", rtol=1e-5,
                          maxits=200)
            g = np.asarray(ksp_goldens[newton_it])
            assert int(r.its) == len(g) - 1, int(r.its)
            h = np.asarray(r.history[:len(g)])
            np.testing.assert_allclose(h[g >= 1e-9], g[g >= 1e-9],
                                       rtol=2e-5)
            np.testing.assert_allclose(h[g < 1e-9], g[g < 1e-9],
                                       rtol=5e-4)
            x = x - r.x
        np.testing.assert_allclose(float(jnp.linalg.norm(F(x))),
                                   snes_golden[2], rtol=2e-3)


class TestEx19OverlappingFieldSplit:
    def test_ex19_8_block_size_2_overlapping_fields(self):
        """runex19_8 (makefile:583-587): -pc_fieldsplit_block_size 2
        -pc_fieldsplit_0_fields 0,1 -pc_fieldsplit_1_fields 0,1 — the
        block size is DECOUPLED from the 4-dof problem and both splits
        cover the whole vector (overlapping duplicate splits), each
        solved by LU, multiplicative; fgmres converges in one
        iteration. 7x7 grid (-da_refine 1). Golden oracle-verified."""
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc.fieldsplit import make_fieldsplit

        mx = my = 7
        F = cavity_residual(mx, my)
        x = cavity_initial_guess(mx, my)
        patt = cavity_jacobian_pattern(mx, my)
        plan = ColoredJacobian.from_sparsity(patt, aij_from_scipy(patt))
        N = mx * my * 4
        # bs=2 strided fields: split k = indices ≡ {0,1} (mod 2) = all
        is0 = np.sort(np.concatenate([np.arange(f, N, 2) for f in (0, 1)]))
        is1 = is0.copy()
        P = sp.csr_matrix(patt)
        row_nnz = np.diff(P.indptr)
        snes_golden = [0.146194, 2.50702e-05]
        for newton_it in range(2):
            Fx = F(x)
            np.testing.assert_allclose(float(jnp.linalg.norm(Fx)),
                                       snes_golden[newton_it], rtol=2e-5)
            J = plan.assemble(F, x, Fx)
            vals = np.asarray(J.vals)
            mask = np.arange(vals.shape[1])[None, :] < row_nnz[:, None]
            Jh = sp.csr_matrix((vals[mask], P.indices.copy(),
                                P.indptr.copy()), shape=P.shape)
            pc = make_fieldsplit(Jh, [is0, is1], options=Options(
                {"pc_fieldsplit_type": "multiplicative",
                 "fieldsplit_0_pc_type": "lu",
                 "fieldsplit_1_pc_type": "lu"}), A_dev=J)
            r = ksp_solve(J, Fx, pc=pc, ksp_type="fgmres", rtol=1e-5,
                          maxits=50)
            assert int(r.its) == 1, int(r.its)
            assert float(r.history[1]) < 1e-11
            x = x - r.x
        assert float(jnp.linalg.norm(F(x))) < 1e-11
