"""Linear elasticity cantilever with rigid-body-mode GAMG.

Analog of the reference's GAMG elasticity workflow (PCSetCoordinates,
agg.c:246): plane-strain Q1 cantilever, CG preconditioned by smoothed
aggregation whose tentative prolongator interpolates the 3 rigid-body
modes built from node coordinates.

    python examples/ex_elasticity.py -mx 32 -my 16
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.elasticity import elasticity_2d
from petsctpu.pc import make_pc


def main():
    opts = Options.from_args(sys.argv[1:])
    mx = opts.get_int("mx", 32)
    my = opts.get_int("my", 16)
    A, coords, b = elasticity_2d(mx, my)
    Ad = aij_from_scipy(A)
    pc = make_pc("gamg", A=Ad, A_host=A,
                 options=Options({"pc_gamg_coordinates": coords}))
    res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg",
                    rtol=opts.get_real("ksp_rtol", 1e-8), maxits=200,
                    monitor=opts.get_bool("ksp_monitor_short", False))
    x = np.asarray(res.x)
    print(f"elasticity {mx}x{my} (n={A.shape[0]}): {int(res.its)} its, "
          f"tip deflection = {x[1::2].min():.5f}")


if __name__ == "__main__":
    main()
