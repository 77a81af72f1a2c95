"""PCNN (balanced Neumann-Neumann over MATIS), SNES NASM, SNES MS."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.dm.da import DA
from petsctpu.ksp import ksp_solve
from petsctpu.mat import matis_from_subdomains
from petsctpu.mat.coloring import stencil_coloring
from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
from petsctpu.pc.nn import make_nn
from petsctpu.snes import snes_ms, snes_nasm


def _matis_laplacian_1d(nsub=4, nloc=8):
    """1-D Laplacian on nsub subdomains sharing interface nodes; local
    matrices are the Neumann pieces (floating interiors are singular —
    exactly what NN must handle)."""
    n = nsub * (nloc - 1) + 1
    h = 1.0 / (n - 1)
    locs, l2gs = [], []
    T = (sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nloc, nloc))
         .tolil())
    T[0, 0] = 1.0            # Neumann piece: half-stencil at local ends
    T[-1, -1] = 1.0
    T = sp.csr_matrix(T / h)
    for s in range(nsub):
        start = s * (nloc - 1)
        locs.append(T.copy())
        l2gs.append(np.arange(start, start + nloc))
    M = matis_from_subdomains(locs, l2gs, n)
    # pin both ends (Dirichlet) by adding a large diagonal on boundaries
    Ah = M.assemble_host().tolil()
    return M, n


class TestNN:
    def test_nn_accelerates_cg(self):
        M, n = _matis_laplacian_1d(4, 8)
        # make it nonsingular: impose u(0)=u(1)=0 via extra diagonal
        # on the first/last subdomain pieces
        locs = []
        l2gs = [np.asarray(g) for g in M.l2g]
        from petsctpu.mat.ell import aij_to_scipy
        for i, Ai in enumerate(M.locals_):
            L = aij_to_scipy(Ai).tolil()
            if i == 0:
                L[0, 0] += 1e6
            if i == len(M.locals_) - 1:
                L[-1, -1] += 1e6
            locs.append(sp.csr_matrix(L))
        M = matis_from_subdomains(locs, l2gs, n)
        pc = make_nn(M)
        Ah = M.assemble_host()
        rng = np.random.default_rng(0)
        xex = rng.standard_normal(n)
        b = jnp.asarray(Ah @ xex)
        res_nn = ksp_solve(M, b, pc=pc, ksp_type="fgmres", rtol=1e-8,
                           maxits=200)
        res_plain = ksp_solve(M, b, ksp_type="gmres", rtol=1e-8, maxits=200)
        assert res_nn.converged
        np.testing.assert_allclose(np.asarray(res_nn.x), xex, atol=1e-4)
        assert int(res_nn.its) < int(res_plain.its)

    def test_balancing_handles_floating_subdomains(self):
        """Without the coarse/balanced step, interior floating Neumann
        pieces stall convergence; balancing fixes it."""
        M, n = _matis_laplacian_1d(4, 8)
        locs = []
        l2gs = [np.asarray(g) for g in M.l2g]
        from petsctpu.mat.ell import aij_to_scipy
        for i, Ai in enumerate(M.locals_):
            L = aij_to_scipy(Ai).tolil()
            if i == 0:
                L[0, 0] += 1e6
            if i == len(M.locals_) - 1:
                L[-1, -1] += 1e6
            locs.append(sp.csr_matrix(L))
        M = matis_from_subdomains(locs, l2gs, n)
        Ah = M.assemble_host()
        rng = np.random.default_rng(1)
        xex = rng.standard_normal(n)
        b = jnp.asarray(Ah @ xex)
        bal = ksp_solve(M, b, pc=make_nn(M, balanced=True),
                        ksp_type="fgmres", rtol=1e-8, maxits=100)
        unbal = ksp_solve(M, b, pc=make_nn(M, balanced=False),
                          ksp_type="fgmres", rtol=1e-8, maxits=100)
        assert bal.converged
        assert int(bal.its) <= int(unbal.its)


class TestNASM:
    def test_bratu_two_subdomains(self):
        da = DA((9, 9))
        F = bratu_residual(da, 5.0)
        x0 = bratu_initial_guess(da, 5.0)
        n = 81
        half = np.arange(n)
        subs = [half[:45], half[36:]]       # one-row overlap
        res = snes_nasm(F, x0, subs, rtol=1e-6, maxits=60)
        assert res.converged
        assert float(jnp.linalg.norm(F(res.x))) < 1e-4


class TestMS:
    def test_linear_decay_smoother(self):
        """MS on F(x) = A x − b with diagonal scaling converges like the
        multistage Richardson it is."""
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import ex2_system
        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)

        def F(x):
            return Ad.mult(x) - bj

        dinv = 1.0 / jnp.asarray(A.diagonal())
        res = snes_ms(F, jnp.zeros(36), scheme="vltp31", scale=dinv,
                      damping=0.9, rtol=1e-8, maxits=2000)
        assert res.converged
        np.testing.assert_allclose(np.asarray(res.x), u, atol=1e-5)

    def test_all_schemes_reduce(self):
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import ex2_system
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        bj = jnp.asarray(b)

        def F(x):
            return Ad.mult(x) - bj

        dinv = 1.0 / jnp.asarray(A.diagonal())
        for scheme in ("euler", "jameson83", "vltp21", "vltp61"):
            res = snes_ms(F, jnp.zeros(25), scheme=scheme, scale=dinv,
                          damping=0.5, maxits=50, rtol=0.5)
            assert float(res.fnorm) < float(jnp.linalg.norm(F(jnp.zeros(25)))), scheme


def _ex5_decomp(g=49, ov=3):
    """The runex5_5_nasm decomposition: 49x49 Bratu on a 2x2 process
    grid (DMDA splits 49 as 25+24), -da_overlap 3 — each subdomain is
    the owned patch extended by 3 grid lines toward interior edges
    (DMCreateDomainDecomposition_DA, dadd.c:140-168)."""
    idx = np.arange(g * g).reshape(g, g)
    ranges = [(0, 25), (25, 49)]
    subs, owned = [], []
    for (xs, xe) in ranges:
        for (ys, ye) in ranges:
            sx = (max(0, xs - ov) if xs > 0 else 0,
                  min(g, xe + ov) if xe < g else g)
            sy = (max(0, ys - ov) if ys > 0 else 0,
                  min(g, ye + ov) if ye < g else g)
            subs.append(idx[sx[0]:sx[1], sy[0]:sy[1]].reshape(-1))
            owned.append(idx[xs:xe, ys:ye].reshape(-1))
    return subs, owned


class TestEx5NASMRestrict:
    def test_ex5_5_nasm(self):
        """output/ex5_5_nasm.out: -snes_type nasm -snes_nasm_type
        restrict on 4 subdomains (restricted additive Schwarz: solve
        the overlapped subproblem, write back only the owned points).
        DIGIT-EXACT x11 including the DIVERGED_MAX_IT exit at 10."""
        from petsctpu.dm import DA
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        from petsctpu.snes import snes_nasm
        from petsctpu.snes.api import SNESConfig

        da = DA((49, 49))
        F = bratu_residual(da, 6.0)
        x0 = bratu_initial_guess(da, 6.0)
        subs, owned = _ex5_decomp()
        r = snes_nasm(
            F, x0, subs, nasm_type="restrict", owned=owned, maxits=10,
            rtol=1e-8,
            inner_cfg=SNESConfig(maxits=50, rtol=1e-8, atol=1e-50,
                                 linesearch="bt"),
            inner_ksp=KSPConfig(ksp_type="gmres", rtol=1e-8, maxits=600))
        golden = [1.14125, 0.0710053, 0.0385483, 0.0315995, 0.0261101,
                  0.0222853, 0.0189666, 0.0162485, 0.0139153, 0.0119441,
                  0.010258]
        np.testing.assert_allclose(np.asarray(r.history[:11]), golden,
                                   rtol=2e-5)
        assert int(r.its) == 10 and not bool(r.converged)

    def test_ex5_5_aspin(self):
        """output/ex5_5_aspin.out: ASPIN — Newton-Krylov on the LEFT
        nonlinearly preconditioned function F_L(x) = x − NASM₁(x)
        (snes.c:1984-1988; SNESSetUp forces matrix-free J and pc none,
        snes.c:409-411, and the npc runs exactly ONE iteration,
        snes.c:2554). The unpreconditioned MFFD-GMRES residual stream
        of the first Newton step and the first two function norms
        match the golden to ~5 digits (the remaining digit is set by
        the rtol-1e-5 inner linear solves' trajectory, which the
        golden inherits from GMRES+ILU inner solvers)."""
        import jax.numpy as jnp
        from petsctpu.dm import DA
        from petsctpu.ksp import ksp_solve
        from petsctpu.ksp.common import KSPConfig
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        from petsctpu.snes import snes_nasm, snes_solve
        from petsctpu.snes.api import SNESConfig
        from petsctpu.snes.fdjac import mffd_operator

        da = DA((49, 49))
        F = bratu_residual(da, 6.0)
        x0 = jnp.asarray(bratu_initial_guess(da, 6.0))
        subs, owned = _ex5_decomp()
        inner_cfg = SNESConfig(maxits=50, rtol=1e-8, atol=1e-50,
                               linesearch="bt")
        inner_ksp = KSPConfig(ksp_type="gmres", rtol=1e-8, maxits=600)

        def FL(x):
            return x - snes_nasm(F, x, subs, nasm_type="restrict",
                                 owned=owned, maxits=1, rtol=0.0,
                                 atol=0.0, stol=0.0, inner_cfg=inner_cfg,
                                 inner_ksp=inner_ksp).x

        Fx = FL(x0)
        np.testing.assert_allclose(float(jnp.linalg.norm(Fx)), 3.15088,
                                   rtol=2e-5)
        J = mffd_operator(FL, x0, Fx)
        r = ksp_solve(J, Fx, ksp_type="gmres", rtol=1e-5, maxits=100)
        ksp_golden = [3.15088, 0.605955, 0.41702, 0.183413, 0.0295441,
                      0.00648287, 0.00127121, 0.000181564, 5.58924e-05,
                      5.73067e-06]
        np.testing.assert_allclose(np.asarray(r.history[:10]), ksp_golden,
                                   rtol=1e-4)
        res = snes_solve(FL, x0, jac="fd",
                         cfg=SNESConfig(maxits=1, rtol=1e-8,
                                        linesearch="bt"),
                         ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5,
                                           maxits=100))
        np.testing.assert_allclose(float(res.history[1]), 0.0427232,
                                   rtol=1e-4)
