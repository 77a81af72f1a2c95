"""SNES ex5 analog: 2-D Bratu solid-fuel ignition, Newton-Krylov.

Reference: src/snes/examples/tutorials/ex5.c.
    python examples/ex5.py -da_grid_x 17 -da_grid_y 17 -par 6.0 \
        -snes_monitor
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from petsctpu.core.options import Options
from petsctpu.dm import DA
from petsctpu.models.bratu import bratu_initial_guess, bratu_residual
from petsctpu.snes import SNES


def main(argv):
    opts = Options.from_args(argv)
    mx = opts.get_int("da_grid_x", 4)
    my = opts.get_int("da_grid_y", 4)
    lam = opts.get_real("par", 6.0)
    da = DA((mx, my))
    snes = SNES(options=opts)
    snes.set_function(bratu_residual(da, lam))
    res = snes.solve(bratu_initial_guess(da, lam))
    print(f"Number of SNES iterations = {int(res.its)}")


if __name__ == "__main__":
    main(sys.argv[1:])
