"""ShardedBAIJ — distributed blocked matrix (MPIBAIJ analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from petsctpu.models import laplacian_2d
from petsctpu.parallel import sharded_baij_from_scipy

multidev = pytest.mark.skipif(len(jax.devices()) < 4,
                              reason="needs >= 4 devices")


def _block_system(bs=3, gx=6, gy=5, seed=0):
    L = laplacian_2d(gx, gy)
    rng = np.random.default_rng(seed)
    blocks = rng.standard_normal((gx * gy, bs, bs)) * 0.1
    Bd = sp.block_diag([np.eye(bs) * 4 + b for b in blocks])
    return sp.csr_matrix(sp.kron(L, np.eye(bs)) + Bd)


@multidev
class TestShardedBAIJ:
    def _run(self, M, mesh, x, method="mult"):
        f = jax.jit(shard_map(
            lambda M, v: getattr(M.local(), method)(v), mesh=mesh,
            in_specs=(P("rows"), P("rows")), out_specs=P("rows"),
            check_vma=False))
        return np.asarray(f(M, jnp.asarray(x)))

    def test_mult_matches_scipy_bs3(self):
        A = _block_system(bs=3)
        n = A.shape[0]
        Pn = 4
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("rows",))
        M = sharded_baij_from_scipy(A, Pn, bs=3)
        x = np.zeros(M.shape[0])
        x[:n] = np.random.default_rng(1).standard_normal(n)
        y = self._run(M, mesh, x)
        np.testing.assert_allclose(y[:n], A @ x[:n], atol=1e-12)

    def test_mult_bs2_uneven_shards(self):
        A = _block_system(bs=2, gx=7, gy=3)     # 21 block rows over 4
        n = A.shape[0]
        Pn = 4
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("rows",))
        M = sharded_baij_from_scipy(A, Pn, bs=2)
        x = np.zeros(M.shape[0])
        x[:n] = np.random.default_rng(2).standard_normal(n)
        y = self._run(M, mesh, x)
        np.testing.assert_allclose(y[:n], A @ x[:n], atol=1e-12)

    def test_diagonal(self):
        A = _block_system(bs=3)
        Pn = 4
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("rows",))
        M = sharded_baij_from_scipy(A, Pn, bs=3)
        f = jax.jit(shard_map(lambda M: M.local().diagonal(), mesh=mesh,
                              in_specs=(P("rows"),), out_specs=P("rows"),
                              check_vma=False))
        d = np.asarray(f(M))
        np.testing.assert_allclose(d[:A.shape[0]], A.diagonal(), atol=1e-14)

    def test_ksp_solve_through_blocked_spmv(self):
        """CG over the blocked distributed SpMV converges to the
        direct solution."""
        import scipy.sparse.linalg as spla
        from petsctpu.parallel import par_ksp_solve
        A = _block_system(bs=3)
        A = sp.csr_matrix(A + A.T)              # symmetrize for CG
        n = A.shape[0]
        Pn = 4
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("rows",))
        M = sharded_baij_from_scipy(A, Pn, bs=3)
        b = np.random.default_rng(3).standard_normal(n)
        res = par_ksp_solve(mesh, M, b, ksp_type="cg", rtol=1e-10,
                            maxits=500)
        assert int(res.reason) > 0
        x = np.asarray(res.x).reshape(-1)[:n]
        np.testing.assert_allclose(x, spla.spsolve(A, b), atol=1e-7)
