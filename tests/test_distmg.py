import jax.numpy as jnp
import numpy as np

from petsctpu.models import ex2_system
from petsctpu.parallel import par_ksp_solve
from petsctpu.pc.distmg import make_dist_mg
from tests.testutil import mesh_1d, multidev


@multidev
class TestDistributedMG:
    def test_cg_distmg_matches_serial_quality(self):
        from petsctpu.core.options import Options
        from petsctpu.dm import DA
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc

        mesh = mesh_1d()
        Pn = mesh.devices.size
        m = 33
        A, b, u = ex2_system(m, m)
        pc = make_dist_mg(A, (m, m), Pn)
        res = par_ksp_solve(mesh, pc.A, b, pc=pc, ksp_type="cg", rtol=1e-8)
        assert int(res.reason) > 0
        np.testing.assert_allclose(np.asarray(res.x)[: m * m], u, atol=1e-6)
        # mesh-independent-ish iteration count, comparable to serial MG
        r_serial = ksp_solve(
            aij_from_scipy(A), jnp.asarray(b),
            pc=make_pc("mg", A=aij_from_scipy(A), A_host=A,
                       options=Options({"pc_mg_da": DA((m, m))})),
            ksp_type="cg", rtol=1e-8)
        assert int(res.its) <= int(r_serial.its) + 4, (
            int(res.its), int(r_serial.its))

    def test_distmg_3d(self):
        from petsctpu.models import ex45_system

        mesh = mesh_1d()
        Pn = mesh.devices.size
        g = 17
        A, b, u = ex45_system(g, g, g)
        pc = make_dist_mg(A, (g, g, g), Pn)
        res = par_ksp_solve(mesh, pc.A, b, pc=pc, ksp_type="cg", rtol=1e-8)
        assert int(res.reason) > 0
        assert int(res.its) <= 12, int(res.its)
        np.testing.assert_allclose(np.asarray(res.x)[: g ** 3], u,
                                   atol=1e-6)
