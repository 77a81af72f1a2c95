"""KSP ex10 analog: read a matrix (and optional RHS) from file, solve.

Reference: src/ksp/ksp/examples/tutorials/ex10.c ("Reads a PETSc matrix
and vector from a file and solves a linear system"). Accepts native
.npz checkpoints, MatrixMarket .mtx, or reference-format PETSc binary
files (-f <file>, -rhs <file>).

    python examples/ex10.py -f sys.npz -ksp_type bcgs -pc_type ilu \
        -ksp_monitor
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.io import load_any_matrix, petsc_binary_read_vec, load_vec
from petsctpu.ksp import KSP
from petsctpu.mat import mat_from_options


def main(argv):
    opts = Options.from_args(argv)
    fname = opts.get_str("f")
    if not fname:
        print("usage: ex10.py -f <matrixfile> [-rhs <vecfile>] [options]")
        return 1
    A = load_any_matrix(fname)
    rhs = opts.get_str("rhs", "")
    if rhs:
        b = load_vec(rhs) if rhs.endswith(".npz") else \
            petsc_binary_read_vec(rhs)
    else:
        b = A @ np.ones(A.shape[1])          # ex10's default: b = A·1
    Ad, perm = mat_from_options(A, opts)     # -mat_type aij|band|dia|...
    import scipy.sparse as sp
    A_solve = sp.csr_matrix(A)[perm][:, perm] if perm is not None else A
    b_solve = np.asarray(b)[perm] if perm is not None else np.asarray(b)
    ksp = KSP(options=opts)
    ksp.set_operators(Ad, A_host=A_solve)
    res = ksp.solve(jnp.asarray(b_solve))
    x = np.asarray(res.x)
    if perm is not None:                     # back to application ordering
        xa = np.empty_like(x)
        xa[perm] = x
        x = xa
    rnorm = np.linalg.norm(np.asarray(b) - A @ x)
    print(f"Number of iterations = {int(res.its):3d}")
    print(f"Residual norm {rnorm:.4e}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]) or 0)
