"""Lid-driven Stokes cavity — saddle-point solve demo.

Analog of the reference's Stokes tutorials (ksp ex42/ex43-style):
MAC-grid Stokes solved by FGMRES + PCFieldSplit(Schur) with the
pressure-constant null space projected.

    python examples/ex_stokes.py -m 12 -ksp_monitor_short
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
from petsctpu.mat.nullspace import make_nullspace
from petsctpu.models.stokes import stokes_mac
from petsctpu.pc import make_pc
from petsctpu.vec.indexset import IS


def main():
    opts = Options.from_args(sys.argv[1:])
    m = opts.get_int("m", 12)
    K, b, (vi, pi), blk = stokes_mac(m)
    Kd = aij_from_scipy(K)
    pc = make_pc("fieldsplit", A=Kd, A_host=K, options=Options({
        "pc_fieldsplit_fields": [IS.general(vi), IS.general(pi)],
        "pc_fieldsplit_type": opts.get_str("pc_fieldsplit_type", "schur")}))
    v = np.zeros(K.shape[0])
    v[pi] = 1.0
    nsp = make_nullspace(K.shape[0], has_constant=False, vecs=[v])
    res = ksp_solve(Kd, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                    rtol=opts.get_real("ksp_rtol", 1e-8), maxits=200,
                    nullspace=nsp,
                    monitor=opts.get_bool("ksp_monitor_short", False))
    x = np.asarray(res.x)
    div = np.abs(blk["D"] @ x[vi]).max()
    print(f"Stokes {m}x{m}: {int(res.its)} its, max|div u| = {div:.3e}, "
          f"max|u| = {np.abs(x[vi]).max():.4f}")
    left = [k for k in opts.unused() if k != "m"]
    if left:
        print("WARNING: unused options:", left)


if __name__ == "__main__":
    main()
