"""SNES ex19 analog: driven cavity (velocity-vorticity + temperature).

Reference: src/snes/examples/tutorials/ex19.c. Golden (output/
ex19_1.out): 25x25 grid, lid velocity 0.0016 → SNES norms 0.0406612,
3.35993e-06, 2.643e-11, 2 Newton iterations.

    python examples/ex19.py -da_grid 25 -snes_monitor_short
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from petsctpu.core.options import Options
from petsctpu.ksp.common import KSPConfig
from petsctpu.models.cavity import cavity_initial_guess, cavity_residual
from petsctpu.snes import snes_solve


def main(argv):
    opts = Options.from_args(argv)
    mx = my = opts.get_int("da_grid", 25)
    lid = opts.get_real("lidvelocity", 1.0 / (mx * my))
    pr = opts.get_real("prandtl", 1.0)
    gr = opts.get_real("grashof", 1.0)
    print(f"lid velocity = {lid:g}, prandtl # = {pr:g}, grashof # = {gr:g}")
    F = cavity_residual(mx, my, lid, pr, gr)
    res = snes_solve(
        F, cavity_initial_guess(mx, my, gr), jac="jvp",
        rtol=1e-8, monitor=opts.get_bool("snes_monitor_short", False)
        or opts.get_bool("snes_monitor", False),
        ksp_cfg=KSPConfig(ksp_type="gmres", rtol=1e-5, maxits=2000,
                          restart=100))
    jax.effects_barrier()
    print(f"Number of SNES iterations = {int(res.its)}")


if __name__ == "__main__":
    main(sys.argv[1:])
