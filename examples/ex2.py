"""KSP ex2 analog: 2-D Laplacian solve with runtime options.

Reference: src/ksp/ksp/examples/tutorials/ex2.c. Golden run:
    python examples/ex2.py -ksp_monitor_short -m 5 -n 5 \
        -ksp_gmres_cgs_refinement_type refine_always
must print the reference's output/ex2_1.out residual history
(3.21109 … 0.000387275, 4 iterations, error 0.000392701).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.ksp import KSP
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system


def main(argv):
    opts = Options.from_args(argv)
    m = opts.get_int("m", 8)
    n = opts.get_int("n", 7)
    A, b, u = ex2_system(m, n)
    Ad = aij_from_scipy(A)
    ksp = KSP(options=opts)
    ksp.set_operators(Ad, A_host=A)
    ksp.cfg = ksp.cfg.__class__(rtol=1e-2 / ((m + 1) * (n + 1)), atol=1e-50)
    res = ksp.solve(jnp.asarray(b))
    err = np.linalg.norm(np.asarray(res.x) - u)
    print(f"Norm of error {err:g} iterations {int(res.its)}")
    unused = opts.unused()
    if unused:
        print(f"WARNING: unused options: {unused}")


if __name__ == "__main__":
    main(sys.argv[1:])
