import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from petsctpu.mat import stencil_from_scipy
from petsctpu.models import ex2_system, laplacian_2d, poisson_3d
from petsctpu.parallel import par_ksp_solve, sharded_stencil_from
from petsctpu.pc.simple import JacobiPC
from tests.testutil import mesh_1d, multidev


@multidev
class TestShardedStencil:
    def test_mult_matches_serial_2d(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        m, n = 19, 13                       # m not divisible by 8 → padded
        A = laplacian_2d(m, n)
        S = stencil_from_scipy(A, (m, n))
        Sh = sharded_stencil_from(S, Pn)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(m * n)
        xp = np.zeros(Sh.shape[0])
        xp[: m * n] = x
        import jax as J
        from jax.sharding import NamedSharding
        xs = J.device_put(jnp.asarray(xp),
                          NamedSharding(mesh, P("rows")))
        f = jax.jit(shard_map(lambda M, v: M.local().mult(v), mesh=mesh,
                              in_specs=(P("rows"), P("rows")),
                              out_specs=P("rows"), check_vma=False))
        y = np.asarray(f(Sh, xs))[: m * n]
        np.testing.assert_allclose(y, A @ x, rtol=1e-12)

    def test_mult_matches_serial_3d(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        g = (16, 5, 7)
        A = poisson_3d(g[2], g[1], g[0])    # builder order i fastest
        S = stencil_from_scipy(A, g)
        Sh = sharded_stencil_from(S, Pn)
        x = np.random.default_rng(1).standard_normal(np.prod(g))
        from jax.sharding import NamedSharding
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
        f = jax.jit(shard_map(lambda M, v: M.local().mult(v), mesh=mesh,
                              in_specs=(P("rows"), P("rows")),
                              out_specs=P("rows"), check_vma=False))
        np.testing.assert_allclose(np.asarray(f(Sh, xs)), A @ x, rtol=1e-12)

    def test_distributed_cg_stencil(self):
        mesh = mesh_1d()
        Pn = mesh.devices.size
        m = 16
        A, b, u = ex2_system(m, m)
        S = stencil_from_scipy(A, (m, m))
        Sh = sharded_stencil_from(S, Pn)
        # sharded jacobi: diagonal per shard, stacked
        dpad = np.ones(Sh.shape[0])
        dpad[: m * m] = A.diagonal()
        pc = JacobiPC(jnp.asarray(1.0 / dpad.reshape(Pn, -1)))
        res = par_ksp_solve(mesh, Sh, b, pc=pc, ksp_type="cg", rtol=1e-10)
        assert int(res.reason) > 0
        np.testing.assert_allclose(np.asarray(res.x)[: m * m], u, atol=1e-8)

    def test_distributed_matches_serial_iterations(self):
        from petsctpu.ksp import ksp_solve
        from petsctpu.pc.simple import make_jacobi

        mesh = mesh_1d()
        Pn = mesh.devices.size
        m = 16
        A, b, u = ex2_system(m, m)
        S = stencil_from_scipy(A, (m, m))
        Sh = sharded_stencil_from(S, Pn)
        dpad = np.ones(Sh.shape[0])
        dpad[: m * m] = A.diagonal()
        pc = JacobiPC(jnp.asarray(1.0 / dpad.reshape(Pn, -1)))
        rd = par_ksp_solve(mesh, Sh, b, pc=pc, ksp_type="pipecg", rtol=1e-10)
        rs = ksp_solve(S, jnp.asarray(b), pc=make_jacobi(S),
                       ksp_type="pipecg", rtol=1e-10)
        assert int(rd.its) == int(rs.its)
