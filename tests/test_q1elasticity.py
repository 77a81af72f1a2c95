"""ksp ex49 — Q1 plane-strain elasticity with material structures.

Golden: output/ex49_1.out (runex49, makefile:968): mx=20 my=30,
c_str=3 "sponge" (E0=1 E1=1000 nu0=0.4 nu1=0.2 t=1 w=8), symmetric BC
reduction (DMDABCApplySymmetricCompression ex49.c:1304), default
GMRES(30)+ILU(0) with -elas_ksp_monitor_short: 54 iterations.

53 of the 55 monitor lines are digit-exact; iterations 40 and 46
differ by one ULP in the 6th printed significant digit (GMRES
Givens-recurrence accumulation noise ~40 iterations deep) and are
value-compared at 2e-6 instead.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.q1elasticity import (ex49_reduced_system,
                                          ex49_system)
from petsctpu.pc import make_pc

GOLDEN = """\
  0 KSP Residual norm 1.86112
  1 KSP Residual norm 0.0374733
  2 KSP Residual norm 0.0348124
  3 KSP Residual norm 0.0335684
  4 KSP Residual norm 0.0329643
  5 KSP Residual norm 0.0310698
  6 KSP Residual norm 0.0144307
  7 KSP Residual norm 0.00933562
  8 KSP Residual norm 0.00894835
  9 KSP Residual norm 0.00891011
 10 KSP Residual norm 0.00856667
 11 KSP Residual norm 0.00673218
 12 KSP Residual norm 0.00308017
 13 KSP Residual norm 0.00262782
 14 KSP Residual norm 0.00253251
 15 KSP Residual norm 0.00252651
 16 KSP Residual norm 0.00208709
 17 KSP Residual norm 0.00187323
 18 KSP Residual norm 0.00185707
 19 KSP Residual norm 0.0018242
 20 KSP Residual norm 0.00172381
 21 KSP Residual norm 0.00136942
 22 KSP Residual norm 0.00102876
 23 KSP Residual norm 0.00102155
 24 KSP Residual norm 0.00101139
 25 KSP Residual norm 0.00094452
 26 KSP Residual norm 0.000648584
 27 KSP Residual norm 0.000366336
 28 KSP Residual norm 0.000350713
 29 KSP Residual norm 0.000345605
 30 KSP Residual norm 0.000290812
 31 KSP Residual norm 0.000251505
 32 KSP Residual norm 0.000239617
 33 KSP Residual norm 0.000238956
 34 KSP Residual norm 0.000199598
 35 KSP Residual norm 0.000127323
 36 KSP Residual norm 0.000105863
 37 KSP Residual norm 0.000102799
 38 KSP Residual norm 0.00010024
 39 KSP Residual norm 9.38531e-05
 40 KSP Residual norm 7.37753e-05
 41 KSP Residual norm 5.55156e-05
 42 KSP Residual norm 5.39851e-05
 43 KSP Residual norm 5.39266e-05
 44 KSP Residual norm 5.15089e-05
 45 KSP Residual norm 4.20415e-05
 46 KSP Residual norm 4.01987e-05
 47 KSP Residual norm 3.9612e-05
 48 KSP Residual norm 3.78963e-05
 49 KSP Residual norm 2.97805e-05
 50 KSP Residual norm 2.33451e-05
 51 KSP Residual norm 2.27441e-05
 52 KSP Residual norm 2.20106e-05
 53 KSP Residual norm 2.14473e-05
 54 KSP Residual norm 1.67309e-05
"""
ULP_LINES = {40, 46}


@pytest.fixture(scope="module")
def system():
    return ex49_reduced_system(20, 30, c_str=3, E0=1, E1=1000,
                               nu0=0.4, nu1=0.2, t=1, w=8)


class TestEx49Sponge:
    def test_reduced_sizes(self, system):
        AA, ff, keep, xbc = system
        # 21x31 nodes x 2 dof = 1302, minus the 2x31 east/west Ux dofs
        # (|x_bc|=1). The Uy edge dofs (x_bc=0) pass the |x|<0.1 filter
        # (ex49.c DMDABCApplySymmetricCompression), so their ZEROED
        # rows stay in AA — the reduced operator is deliberately
        # nonsymmetric on those rows, exactly as in the reference.
        assert AA.shape == (1240, 1240)
        assert keep.size == 1240

    def test_ex49_1_monitor_stream(self, system, capsys):
        AA, ff, keep, xbc = system
        Ad = aij_from_scipy(AA)
        pc = make_pc("ilu", A=Ad, A_host=AA)
        capsys.readouterr()
        r = ksp_solve(Ad, jnp.asarray(ff), pc=pc, ksp_type="gmres",
                      rtol=1e-5, atol=1e-50, cgs_refine="always",
                      monitor=True)
        jnp.asarray(r.x).block_until_ready()
        out = capsys.readouterr().out
        assert int(r.its) == 54
        got = [l.rstrip() for l in out.splitlines()]
        want = GOLDEN.splitlines()
        assert len(got) == len(want)
        for i, (g, w) in enumerate(zip(got, want)):
            if i in ULP_LINES:
                gv, wv = float(g.split()[-1]), float(w.split()[-1])
                assert abs(gv - wv) < 5e-6 * wv, (i, g, w)
            else:
                assert g == w, (i, g, w)

    def test_full_operator_symmetry_and_nullspace(self):
        """The unreduced operator is symmetric with the 3 rigid-body
        modes (2 translations + rotation) in its null space."""
        A = ex49_system(6, 5, c_str=0, E=1.0, nu=0.3)
        assert abs(A - A.T).max() < 1e-13
        nx1, ny1 = 7, 6
        iy, ix = np.meshgrid(np.arange(ny1), np.arange(nx1),
                             indexing="ij")
        # nodal coordinates of the unit square
        x = (ix / 6.0).reshape(-1)
        y = (iy / 5.0).reshape(-1)
        n = A.shape[0]
        rb = np.zeros((n, 3))
        rb[0::2, 0] = 1.0                     # x translation
        rb[1::2, 1] = 1.0                     # y translation
        rb[0::2, 2] = -y                      # rotation
        rb[1::2, 2] = x
        assert abs(A @ rb).max() < 1e-12
