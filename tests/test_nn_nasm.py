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
