"""SNES ex5 with FAS nonlinear multigrid (the -snes_type fas path).

Reference: src/snes/examples/tutorials/ex5.c run with -snes_type fas
(SNESFAS, src/snes/impls/fas/fas.c).
    python examples/ex5_fas.py -da_grid_x 33 -da_grid_y 33 -par 6.0 \
        -fas_levels 3 -snes_monitor
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from petsctpu.core.options import Options
from petsctpu.dm import DA
from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
from petsctpu.snes import fas_levels_from_da, snes_fas


def main(argv):
    opts = Options.from_args(argv)
    mx = opts.get_int("da_grid_x", 17)
    my = opts.get_int("da_grid_y", 17)
    lam = opts.get_real("par", 6.0)
    nlev = opts.get_int("fas_levels", 3)
    monitor = opts.get_bool("snes_monitor", False)

    da = DA((mx, my))
    levels = fas_levels_from_da(da, lambda d: bratu_residual(d, lam), nlev)
    x0 = bratu_initial_guess(da, lam)
    res = snes_fas(levels, x0, rtol=1e-8, maxits=40, monitor=monitor)
    F = bratu_residual(da, lam)
    print(f"FAS({nlev} levels) {'converged' if res.converged else 'FAILED'} "
          f"in {int(res.its)} V-cycles, ||F|| = "
          f"{float(jnp.linalg.norm(F(res.x))):.3e}")
    return res


if __name__ == "__main__":
    main(sys.argv[1:])
