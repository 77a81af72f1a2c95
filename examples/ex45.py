"""KSP ex45 analog: 3-D 7-point Poisson with multigrid.

Reference: src/ksp/ksp/examples/tutorials/ex45.c.
    python examples/ex45.py -da_grid 17 -ksp_type cg -pc_type mg \
        -ksp_monitor_short
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.dm import DA
from petsctpu.ksp import KSP
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex45_system


def main(argv):
    opts = Options.from_args(argv)
    g = opts.get_int("da_grid", 9)
    A, b, u = ex45_system(g, g, g)
    if opts.get_str("pc_type", "") == "mg":
        opts.set("pc_mg_da", DA((g, g, g)))
    Ad = aij_from_scipy(A)
    ksp = KSP(options=opts)
    ksp.set_operators(Ad, A_host=A)
    res = ksp.solve(jnp.asarray(b))
    rnorm = np.linalg.norm(np.asarray(b) - A @ np.asarray(res.x))
    print(f"Residual norm {rnorm:g}")
    print(f"Number of iterations = {int(res.its)}")


if __name__ == "__main__":
    main(sys.argv[1:])
