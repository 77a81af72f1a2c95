"""ksp ex43 — Q1-Q1 stabilized variable-viscosity Stokes (SolCx).

Golden: output/ex43_1.out (runex43, makefile:940): FGMRES rtol 1e-8,
PCFieldSplit SYMMETRIC_MULTIPLICATIVE over block-size-3 fields
{0,1}=velocity (preonly+LU) and {2}=pressure (preonly+Jacobi),
SolCx coefficients eta0=1, eta1=1e6, xc=0.5, nz=2 on a 20×20 grid.
The assembled A, B, f were verified BIT-EXACT against an instrumented
oracle build of the reference (see models/q1stokes.py); the monitor
stream and the DMDAIntegrateErrors line are the checked-in golden.

The analytic SolCx evaluation (models/solcx.py) is an independent
stream-function ODE derivation, validated to ~1e-10 relative against
the reference's Maple-generated evaluate_solCx.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.q1stokes import (integrate_errors, q1q1_stokes_system,
                                      solcx_nodal_solution)
from petsctpu.pc.fieldsplit import make_fieldsplit

GOLDEN = (
    "  0 KSP Residual norm 0.0239928 \n"
    "  1 KSP Residual norm 0.00018525 \n"
    "  2 KSP Residual norm 3.95184e-05 \n"
    "  3 KSP Residual norm 8.60318e-07 \n"
    "  4 KSP Residual norm 9.54453e-08 \n"
    "  5 KSP Residual norm 1.07793e-08 \n"
    "  6 KSP Residual norm 9.097e-10 \n"
    "  7 KSP Residual norm 2.479e-10 \n"
    "  8 KSP Residual norm 4.583e-11 \n")
GOLDEN_ERRORS = "4.7619e-02   1.2519e-03   7.1432e-05   2.3330e-03 "


@pytest.fixture(scope="module")
def solved():
    A, B, f = q1q1_stokes_system(20, 20, c_str=0, eta0=1.0, eta1=1.0e6,
                                 xc=0.5, nz=2)
    n = A.shape[0]
    c = np.arange(n) % 3
    fields = [np.flatnonzero(c != 2), np.flatnonzero(c == 2)]
    opts = Options({"pc_fieldsplit_type": "symmetric_multiplicative",
                    "fieldsplit_0_pc_type": "lu",
                    "fieldsplit_1_pc_type": "jacobi"})
    pc = make_fieldsplit(B, fields, options=opts, Amat_host=A)
    Ad = aij_from_scipy(A)
    res = ksp_solve(Ad, jnp.asarray(f), pc=pc, ksp_type="fgmres",
                    rtol=1e-8, maxits=10000, monitor=True)
    return A, f, res


class TestEx43SolCx:
    def test_monitor_stream_digit_exact(self, solved, capsys):
        capsys.readouterr()
        A, f, res = solved
        # re-solve with monitor to capture the stream fresh
        n = A.shape[0]
        c = np.arange(n) % 3
        fields = [np.flatnonzero(c != 2), np.flatnonzero(c == 2)]
        _, B, _ = q1q1_stokes_system(20, 20, c_str=0, eta0=1.0,
                                     eta1=1.0e6, xc=0.5, nz=2)
        opts = Options({"pc_fieldsplit_type": "symmetric_multiplicative",
                        "fieldsplit_0_pc_type": "lu",
                        "fieldsplit_1_pc_type": "jacobi"})
        pc = make_fieldsplit(B, fields, options=opts, Amat_host=A)
        res2 = ksp_solve(aij_from_scipy(A), jnp.asarray(f), pc=pc,
                         ksp_type="fgmres", rtol=1e-8, maxits=10000,
                         monitor=True)
        jnp.asarray(res2.x).block_until_ready()
        out = capsys.readouterr().out
        assert out == GOLDEN, f"monitor mismatch:\n{out}"

    def test_iteration_count(self, solved):
        _, _, res = solved
        assert int(res.its) == 8
        assert int(res.reason) > 0

    def test_solcx_errors_digit_exact(self, solved):
        A, f, res = solved
        Xa = solcx_nodal_solution(20, 20, eta0=1.0, eta1=1.0e6, xc=0.5,
                                  nz=2)
        h, pL2, uL2, uH1 = integrate_errors(20, 20, np.asarray(res.x), Xa)
        line = f"{h:1.4e}   {pL2:1.4e}   {uL2:1.4e}   {uH1:1.4e} "
        assert line == GOLDEN_ERRORS, line
