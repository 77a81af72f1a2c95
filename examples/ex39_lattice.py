"""KSP ex39 analog: 2-D lattice gauge model, complex scalars.

Reference: src/ksp/ksp/examples/tutorials/ex39.c (PCASA lattice
gauge, PETSC_USE_COMPLEX). The gauge operator H is reproduced
ENTRY-EXACT from the reference's rand48 stream (models/lattice.py,
pinned against the complex-oracle dump in tests/data/ex39_H.bin);
the normal-equation solve H² x = Hᵀb runs CG with our algebraic
multigrid in place of the reference's adaptive-SA PCASA.

    python examples/ex39_lattice.py -size 6 -beta 1.0 -rho 1.0
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.lattice import lattice_gauge_system


def main(argv):
    opts = Options.from_args(argv)
    n = opts.get_int("size", 6)
    beta = opts.get_real("beta", 1.0)
    rho = opts.get_real("rho", 1.0)
    HtH, Htb, H = lattice_gauge_system(n, beta, rho)
    print(f"lattice {n}x{n}, 2 spin dofs: H {H.shape}, "
          f"||Htb|| = {np.linalg.norm(Htb):.6f}")
    Ad = aij_from_scipy(HtH, dtype=np.complex128)
    r = ksp_solve(Ad, jnp.asarray(Htb), ksp_type="cg", rtol=1e-6,
                  maxits=500)
    x = np.asarray(r.x)
    res = np.linalg.norm(HtH @ x - Htb)
    print(f"CG converged: reason {int(r.reason)}, its {int(r.its)}, "
          f"residual {res:.3e}")


if __name__ == "__main__":
    main(sys.argv[1:])
