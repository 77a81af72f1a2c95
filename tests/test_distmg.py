import jax
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

    def test_multilevel_sharded_hierarchy(self):
        """Two sharded levels (65² → 33² sharded, ≤512 replicated):
        the GAMG proc-reduction analog keeps big levels SPMD."""
        mesh = mesh_1d()
        Pn = mesh.devices.size
        m = 65
        A, b, u = ex2_system(m, m)
        pc = make_dist_mg(A, (m, m), Pn)
        assert len(pc.levels) == 2 and len(pc.transfers) == 1
        res = par_ksp_solve(mesh, pc.A, b, pc=pc, ksp_type="cg", rtol=1e-8)
        assert int(res.reason) > 0
        assert int(res.its) <= 10, int(res.its)
        np.testing.assert_allclose(np.asarray(res.x)[: m * m], u, atol=1e-6)

    def test_sharded_q1_transfer_matches_scipy(self):
        """ShardedQ1Interp mult/multT == the scipy Q1 operator on the
        true entries (pads stay zero)."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        from petsctpu.dm.da import q1_interp_scipy
        from petsctpu.parallel.pstencil import sharded_q1_interp

        mesh = mesh_1d()
        Pn = mesh.devices.size
        fg, cg = (33, 9), (17, 5)
        T = sharded_q1_interp(fg, cg, Pn, mloc_f=2 * (-(-cg[0] // Pn)))
        Ps = q1_interp_scipy(fg, cg)
        rng = np.random.default_rng(3)
        xc = rng.standard_normal(cg[0] * cg[1])
        xf = rng.standard_normal(fg[0] * fg[1])
        ncp = int(np.prod(T.coarse))
        nfp = int(np.prod(T.fine))
        xcp = np.zeros(ncp)
        xcp[: xc.size] = xc
        xfp = np.zeros(nfp)
        xfp[: xf.size] = xf

        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(PS("rows"), PS("rows"), PS("rows")),
                 out_specs=(PS("rows"), PS("rows")))
        def run(Tst, c, f):
            Tl = Tst.local()
            return Tl.mult(c), Tl.multT(f)

        yf, yc = run(T, jnp.asarray(xcp), jnp.asarray(xfp))
        np.testing.assert_allclose(np.asarray(yf)[: xf.size], Ps @ xc,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(yf)[xf.size:], 0.0)
        np.testing.assert_allclose(np.asarray(yc)[: xc.size], Ps.T @ xf,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(yc)[xc.size:], 0.0)

    def test_hier_dcn_ici_mg(self):
        """(2 hosts × 4 chips) mesh: fine level sharded over all 8
        shards, mid level re-sharded onto each host's ici axis
        (redundant across dcn), coarsest replicated — the GAMG
        rank-reduction ladder on the two-level fabric."""
        from jax.sharding import Mesh

        from petsctpu.pc.distmg import make_dist_mg_hier

        devs = np.asarray(jax.devices())
        if devs.size < 8:
            import pytest
            pytest.skip("needs 8 devices")
        mesh = Mesh(devs[:8].reshape(2, 4), ("dcn", "ici"))
        m = 65
        A, b, u = ex2_system(m, m)
        pc = make_dist_mg_hier(A, (m, m), 2, 4)
        assert pc.inner is not None and pc.coarse is None
        assert pc.inner.nshards == 4 and pc.nshards == 8
        res = par_ksp_solve(mesh, pc.A, b, pc=pc, ksp_type="cg",
                            rtol=1e-8)
        assert int(res.reason) > 0
        assert int(res.its) <= 10, int(res.its)
        np.testing.assert_allclose(np.asarray(res.x)[: m * m], u,
                                   atol=1e-6)

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


@multidev
class TestDistributedGAMG:
    def test_sharded_rect_transfer_matches_scipy(self):
        """ShardedRectAIJ mult/multT == the scipy prolongator on the
        true entries (rectangular halo plan over the coarse layout)."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        from petsctpu.parallel.pmat import sharded_rect_from_scipy
        from petsctpu.pc.gamg import gamg_hierarchy

        mesh = mesh_1d()
        Pn = mesh.devices.size
        A, b, u = ex2_system(17, 17)
        As, Ps = gamg_hierarchy(A)
        Psc = Ps[0]
        T = sharded_rect_from_scipy(Psc, Pn)
        nf, nc = Psc.shape
        rng = np.random.default_rng(5)
        xc = rng.standard_normal(nc)
        xf = rng.standard_normal(nf)
        xcp = np.zeros(T.shape[1])
        xcp[:nc] = xc
        xfp = np.zeros(T.shape[0])
        xfp[:nf] = xf

        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(PS("rows"), PS("rows"), PS("rows")),
                 out_specs=(PS("rows"), PS("rows")))
        def run(Tst, c, f):
            Tl = Tst.local()
            return Tl.mult(c), Tl.multT(f)

        yf, yc = run(T, jnp.asarray(xcp), jnp.asarray(xfp))
        np.testing.assert_allclose(np.asarray(yf)[:nf], Psc @ xc,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(yc)[:nc], Psc.T @ xf,
                                   atol=1e-12)

    def test_dist_gamg_matches_serial_iterations(self):
        """Distributed GAMG (sharded ShardedAIJ levels + ShardedRectAIJ
        transfers + replicated tail) reaches the same CG iteration
        count as the serial GAMG stack."""
        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc
        from petsctpu.pc.distmg import make_dist_gamg

        mesh = mesh_1d()
        Pn = mesh.devices.size
        m = 65
        A, b, u = ex2_system(m, m)
        pc = make_dist_gamg(A, Pn)
        assert len(pc.levels) >= 2          # really multi-level sharded
        res = par_ksp_solve(mesh, pc.A, b, pc=pc, ksp_type="cg",
                            rtol=1e-8)
        assert int(res.reason) > 0
        np.testing.assert_allclose(np.asarray(res.x)[: m * m], u,
                                   atol=1e-6)
        rs = ksp_solve(aij_from_scipy(A), jnp.asarray(b),
                       pc=make_pc("gamg", A=aij_from_scipy(A), A_host=A),
                       ksp_type="cg", rtol=1e-8)
        assert abs(int(res.its) - int(rs.its)) <= 1, (
            int(res.its), int(rs.its))
