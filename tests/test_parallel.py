import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
from jax import shard_map
from jax.sharding import PartitionSpec as P

from petsctpu.core.layout import Layout
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.parallel import (
    ParKSP, par_ksp_solve, shard_vector, sharded_aij_from_scipy,
    unshard_vector,
)
from petsctpu.parallel.plan import partition_csr
from petsctpu.pc.parallel import make_par_pc
from petsctpu.ksp import ksp_solve
from petsctpu.pc import make_pc
from tests.testutil import mesh_1d, multidev


class TestPartitionPlan:
    """Host-side plan checks (no devices needed)."""

    def test_diag_off_split_reassembles(self):
        A = laplacian_2d(7, 5)          # n=35, P=4 → padded 36
        part = partition_csr(A, 4)
        lay = part.layout
        s = lay.shard_size
        for p in range(4):
            D = part.diag_blocks[p]
            O = part.off_blocks[p]
            g = part.garrays[p]
            r0 = p * s
            for i in range(min(s, lay.n - r0) if r0 < lay.n else 0):
                row = np.zeros(lay.n)
                row[r0:min(r0 + s, lay.n)] = D[i].toarray().ravel()[:max(0, min(r0 + s, lay.n) - r0)]
                if len(g):
                    row[g] += O[i, :len(g)].toarray().ravel()
                np.testing.assert_allclose(row, A[r0 + i].toarray().ravel(),
                                           err_msg=f"shard {p} row {i}")

    def test_halo_plan_simulated(self):
        """Numpy simulation of the all_to_all halo exchange."""
        A = laplacian_2d(6, 6)
        Pn = 4
        part = partition_csr(A, Pn)
        lay = part.layout
        s = lay.shard_size
        x = np.random.default_rng(0).standard_normal(lay.n_padded)
        halo = part.halo
        # simulate: sendbuf[s][d] then exchange
        send = np.zeros((Pn, Pn, halo.smax))
        for p in range(Pn):
            xl = x[p * s:(p + 1) * s]
            send[p] = xl[halo.send_idx[p]]
        for p in range(Pn):
            recv = np.stack([send[src, p] for src in range(Pn)])  # [P, smax]
            ghosts = recv.reshape(-1)[halo.ghost_src[p]]
            ng = halo.n_ghost[p]
            np.testing.assert_allclose(ghosts[:ng], x[part.garrays[p]])


@multidev
class TestShardedMult:
    def test_mult_matches_serial(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        A = laplacian_2d(9, 7)          # n=63 → padded 64
        for style in ("alltoall", "allgather"):
            Ash, part = sharded_aij_from_scipy(A, Pn, style=style)
            lay = part.layout
            rng = np.random.default_rng(1)
            x = rng.standard_normal(lay.n)
            xs = shard_vector(mesh, "rows", x, lay)

            f = jax.jit(shard_map(
                lambda M, v: M.local().mult(v), mesh=mesh,
                in_specs=(P("rows"), P("rows")), out_specs=P("rows"),
                check_vma=False))
            y = unshard_vector(f(Ash, xs), lay)
            np.testing.assert_allclose(y, A @ x, rtol=1e-12,
                                       err_msg=style)

    def test_multT_matches_serial(self):
        """Transpose SpMV: off-diag contributions ride the halo plan in
        REVERSE (MatMultTranspose_MPIAIJ / scatter-reverse analog)."""
        mesh = mesh_1d()
        Pn = mesh.devices.size
        A = laplacian_2d(9, 7).tolil()
        for i in range(62):
            A[i, i + 1] += 0.3          # nonsymmetric so A.T != A
        A = A.tocsr()
        for style in ("alltoall", "allgather"):
            Ash, part = sharded_aij_from_scipy(A, Pn, style=style)
            lay = part.layout
            x = np.random.default_rng(2).standard_normal(lay.n)
            xs = shard_vector(mesh, "rows", x, lay)
            f = jax.jit(shard_map(
                lambda M, v: M.local().multT(v), mesh=mesh,
                in_specs=(P("rows"), P("rows")), out_specs=P("rows"),
                check_vma=False))
            y = unshard_vector(f(Ash, xs), lay)
            np.testing.assert_allclose(y, A.T @ x, rtol=1e-12,
                                       err_msg=style)


@multidev
class TestParallelSolve:
    def test_cg_jacobi_matches_serial(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        A, b, u = ex2_system(8, 8)
        Ash, part = sharded_aij_from_scipy(A, Pn)
        pc = make_par_pc("jacobi", Ash, part)
        res = par_ksp_solve(mesh, Ash, b, pc=pc, ksp_type="cg", rtol=1e-10)
        lay = part.layout
        assert int(res.reason) > 0
        np.testing.assert_allclose(unshard_vector(res.x, lay), u, atol=1e-8)
        # iteration count matches the serial run exactly (same arithmetic)
        Ad = aij_from_scipy(A)
        r_serial = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                             ksp_type="cg", rtol=1e-10)
        assert int(res.its) == int(r_serial.its)

    def test_gmres_bjacobi(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        A, b, u = ex2_system(8, 8)
        Ash, part = sharded_aij_from_scipy(A, Pn)
        pc = make_par_pc("bjacobi", Ash, part)
        res = par_ksp_solve(mesh, Ash, b, pc=pc, ksp_type="gmres", rtol=1e-10)
        assert int(res.reason) > 0
        np.testing.assert_allclose(unshard_vector(res.x, part.layout), u,
                                   atol=1e-8)

    def test_pipecg_distributed(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        A, b, u = ex2_system(8, 8)
        Ash, part = sharded_aij_from_scipy(A, Pn)
        pc = make_par_pc("jacobi", Ash, part)
        res = par_ksp_solve(mesh, Ash, b, pc=pc, ksp_type="pipecg",
                            rtol=1e-10)
        assert int(res.reason) > 0
        np.testing.assert_allclose(unshard_vector(res.x, part.layout), u,
                                   atol=1e-7)

    def test_parksp_object(self):
        from petsctpu.core.options import Options
        mesh = mesh_1d()
        A, b, u = ex2_system(8, 8)
        Ash, part = sharded_aij_from_scipy(A, mesh.devices.size)
        ksp = ParKSP(mesh, options=Options({"ksp_type": "bcgs",
                                            "ksp_rtol": "1e-9"}))
        ksp.set_operators(Ash, part)
        res = ksp.solve(b)
        assert int(res.reason) > 0
        np.testing.assert_allclose(unshard_vector(res.x, part.layout), u,
                                   atol=1e-7)


@multidev
class TestDistributedGolden:
    def test_ex2_2_two_device_bjacobi(self):
        """output/ex2_2.out reproduced on an ACTUAL 2-device mesh:
        GMRES + per-shard ILU(0) block Jacobi, the reference's 2-rank
        default solver, with the same 13/12 PETSC_DECIDE row split —
        distributed golden-output parity (SURVEY §4)."""
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:2]), ("rows",))
        A, b, u = ex2_system(5, 5)
        Ash, part = sharded_aij_from_scipy(A, 2)
        pc = make_par_pc("bjacobi", Ash, part)
        res = par_ksp_solve(mesh, Ash, b, pc=pc, ksp_type="gmres",
                            rtol=1e-2 / 36, atol=1e-50,
                            cgs_refine="always")
        golden = [2.73499, 0.795482, 0.261984, 0.0752998, 0.0230031,
                  0.00521255, 0.00145783, 0.000277319]
        assert int(res.its) == 7
        np.testing.assert_allclose(np.asarray(res.history[:8]), golden,
                                   rtol=2e-5)
        x = unshard_vector(res.x, part.layout)
        np.testing.assert_allclose(np.linalg.norm(x - u), 0.000292349,
                                   rtol=1e-3)
