"""ksp ex8g — GASM with user-set (inner, outer) subdomains.

Golden: output/ex8g_1.out (runex8g_1, makefile:468): -M 7 -N 9
-user_set_subdomains -Mdomains 1 -Ndomains 3 -overlap 1. The PCGASM
capability vs plain ASM: the caller hands the PC explicit PAIRS of
index sets (non-overlapping inner + overlapping outer,
PCGASMSetSubdomains gasm.c) instead of letting MatIncreaseOverlap grow
them — here the outer sets come from PCGASMCreateSubdomains2D's
grid-line rule on a 7-wide index space, which does NOT equal
matrix-connectivity growth (the example builds the matrix with row
width 9 but hands the subdomain generator width 7, so the sets are
deliberately misaligned with the stencil — reproduced verbatim).
GMRES(classical GS, no refinement) + restricted GASM + ILU(0) subs:
error ∞-norm 1.40183e-05, oracle-verified 9 iterations.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.pc.asm import make_asm

GOLDEN_INNER = [(0, 20), (21, 41), (42, 62)]
GOLDEN_OUTER = [(0, 27), (14, 48), (35, 62)]


def ex8g_system(m=7, n=9):
    """5-point Laplacian, row width n (ex8g.c:95-101); b = A·1."""
    N = m * n
    A = sp.lil_matrix((N, N))
    for Ii in range(N):
        i, j = Ii // n, Ii % n
        if i > 0:
            A[Ii, Ii - n] = -1.0
        if i < m - 1:
            A[Ii, Ii + n] = -1.0
        if j > 0:
            A[Ii, Ii - 1] = -1.0
        if j < n - 1:
            A[Ii, Ii + 1] = -1.0
        A[Ii, Ii] = 4.0
    A = A.tocsr()
    u = np.ones(N)
    return A, A @ u, u


def gasm_subdomains_2d(M, N, Md, Nd, overlap):
    """PCGASMCreateSubdomains2D (gasm.c): Md×Nd boxes on an M-wide
    N-tall index space, outer = inner ± overlap grid lines, clipped."""
    inner, outer = [], []
    ystart = 0
    for jd in range(Nd):
        h = N // Nd + ((N % Nd) > jd)
        ylow, yhigh = max(ystart - overlap, 0), min(ystart + h + overlap, N)
        xstart = 0
        for id_ in range(Md):
            w = M // Md + ((M % Md) > id_)
            xlo, xhi = max(xstart - overlap, 0), min(xstart + w + overlap, M)
            ii = np.concatenate([np.arange(y * M + xstart,
                                           y * M + xstart + w)
                                 for y in range(ystart, ystart + h)])
            oo = np.concatenate([np.arange(y * M + xlo, y * M + xhi)
                                 for y in range(ylow, yhigh)])
            inner.append(ii)
            outer.append(oo)
            xstart += w
        ystart += h
    return inner, outer


class TestEx8gGASM:
    def test_subdomain_sets_match_golden(self):
        inner, outer = gasm_subdomains_2d(7, 9, 1, 3, 1)
        for k in range(3):
            assert (inner[k].min(), inner[k].max()) == GOLDEN_INNER[k]
            assert inner[k].size == 21
            assert (outer[k].min(), outer[k].max()) == GOLDEN_OUTER[k]
            assert np.array_equal(outer[k],
                                  np.arange(outer[k].min(),
                                            outer[k].max() + 1))

    def test_ex8g_1_error_norm(self):
        A, b, u = ex8g_system()
        inner, outer = gasm_subdomains_2d(7, 9, 1, 3, 1)
        pc = make_asm(A, blocks=inner, outer=outer, sub_pc="ilu")
        r = ksp_solve(aij_from_scipy(A), jnp.asarray(b), pc=pc,
                      ksp_type="gmres", rtol=1e-5, atol=1e-50)
        assert int(r.its) == 9
        err = np.abs(np.asarray(r.x) - u).max()
        assert f"{err:g}" == "1.40183e-05", err
