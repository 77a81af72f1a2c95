"""KSP ex9 analog: two linear systems solved in alternation.

Reference: src/ksp/ksp/examples/tutorials/ex9.c — demonstrates
per-solver options prefixes (the second solver reads `s2_`-prefixed
keys), KSPSetInitialGuessNonzero reuse of the previous solution, and
repeated re-assembly/re-solve. Golden run:
    python examples/ex9.py -t 2 -pc_type jacobi -ksp_monitor_short \
        -ksp_type gmres -ksp_gmres_cgs_refinement_type refine_always \
        -s2_ksp_type bcgs -s2_pc_type jacobi -s2_ksp_monitor_short
reproduces output/ex9_1.out's four monitor histories (system 1
converges at iteration 0 in round 2 thanks to the nonzero guess).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import scipy.sparse as sp

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.ksp.common import _fmt_short
from petsctpu.mat import aij_from_scipy
from petsctpu.pc import make_pc


def grid5pt(m, n, diag):
    N = m * n
    rows, cols, vals = [], [], []
    for Ii in range(N):
        i, j = divmod(Ii, n)
        for ci, cj in ((i - 1, j), (i + 1, j), (i, j - 1), (i, j + 1)):
            if 0 <= ci < m and 0 <= cj < n:
                rows.append(Ii)
                cols.append(cj + n * ci)
                vals.append(-1.0)
        rows.append(Ii)
        cols.append(Ii)
        vals.append(diag)
    return sp.csr_matrix((vals, (rows, cols)), shape=(N, N))


def nonsym(m, n, t):
    N = m * n
    rows, cols, vals = [], [], []
    for Ii in range(N):
        i = Ii // n
        if i > 0:
            rows.append(Ii)
            cols.append(Ii - n)
            vals.append(-1.0 * (t + 0.5))
    return sp.csr_matrix((vals, (rows, cols)), shape=(N, N))


def print_history(res, prefix=""):
    for k in range(int(res.its) + 1):
        print(f"{prefix}{k:3d} KSP Residual norm "
              f"{_fmt_short(res.history[k])} ")


def main(argv):
    opts = Options.from_args(argv)
    ntimes = opts.get_int("t", 2)
    m, n = 3, 2
    u = np.arange(6.0)
    s2 = opts.prefixed("s2_")
    x1 = jnp.zeros(6)
    for t in range(ntimes):
        C1 = (grid5pt(m, n, 4.0) + nonsym(m, n, t)).tocsr()
        Ad = aij_from_scipy(C1)
        pc = make_pc(opts.get_str("pc_type", "jacobi"), A=Ad, A_host=C1)
        refine = opts.get_str("ksp_gmres_cgs_refinement_type", "never")
        r = ksp_solve(Ad, jnp.asarray(C1 @ u), x0=x1, pc=pc,
                      ksp_type=opts.get_str("ksp_type", "gmres"),
                      rtol=1e-5, atol=1e-50,
                      cgs_refine="always" if "always" in refine else
                      "never", guess_nonzero=(t > 0))
        if opts.get_bool("ksp_monitor_short", False):
            print_history(r)
        x1 = r.x
        C2 = (grid5pt(m, n, 6.0 + t * 0.5) + nonsym(m, n, t)).tocsr()
        Ad2 = aij_from_scipy(C2)
        pc2 = make_pc(s2.get_str("pc_type", "jacobi"), A=Ad2, A_host=C2)
        r2 = ksp_solve(Ad2, jnp.asarray(C2 @ u), pc=pc2,
                       ksp_type=s2.get_str("ksp_type", "bcgs"),
                       rtol=1e-5, atol=1e-50)
        if s2.get_bool("ksp_monitor_short", False):
            print("  Residual norms for s2_ solve.")
            print_history(r2)


if __name__ == "__main__":
    main(sys.argv[1:])
