"""2-D block domain-decomposition sharding (DADecomp2D → ShardedAIJ).

The DMDA process-grid ordering makes each rank's 2-D patch contiguous,
so the sharded SpMV's halo volume is O(patch perimeter) rather than
the O(grid width) of 1-D strip sharding (SURVEY §2.10 P2/P12 — the
reference gets the same effect from DMDA's 2-D partitions feeding
PetscLayout).
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.dm.decomp import DADecomp2D
from petsctpu.models import laplacian_2d
from petsctpu.parallel import (par_ksp_solve, sharded_aij_from_scipy,
                               unshard_vector)
from petsctpu.parallel.pmat import sharded_aij_from_decomp
from petsctpu.pc.parallel import make_par_pc
from tests.testutil import mesh_1d


def _halo_bytes(part):
    """Total values exchanged per SpMV across all shards."""
    return sum(int(n) for n in part.halo.n_ghost)


class TestDecompSharding:
    def test_mult_matches_serial(self):
        m = 12
        A = laplacian_2d(m, m)
        dec = DADecomp2D.create(m, m, dof=1, size=4)
        mat, part, q = sharded_aij_from_decomp(A, dec)
        rng = np.random.default_rng(3)
        x = rng.standard_normal(m * m)
        nt = part.layout.n
        xp = np.zeros(nt)
        xp[q] = x
        mesh = mesh_1d(4)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        xs = jax.device_put(
            xp, NamedSharding(mesh, P("rows")))
        from jax import shard_map
        y = jax.jit(shard_map(
            lambda M, v: M.local().mult(v), mesh=mesh,
            in_specs=(P("rows"), P("rows")), out_specs=P("rows"),
            check_vma=False))(mat, xs)
        np.testing.assert_allclose(np.asarray(y)[q], A @ x, atol=1e-12)

    def test_halo_smaller_than_strips(self):
        """On a square grid the 2×2 block partition moves ~half the
        halo values of 4 horizontal strips."""
        m = 32
        A = laplacian_2d(m, m)
        dec = DADecomp2D.create(m, m, dof=1, size=4)
        _, part2d, _ = sharded_aij_from_decomp(A, dec)
        _, part1d = sharded_aij_from_scipy(A, 4)
        h2, h1 = _halo_bytes(part2d), _halo_bytes(part1d)
        # strips: 6 interior boundaries x 32 = 192; blocks: 4 x (16+16)
        # + 8 corner-adjacent = ~136
        assert h2 < 0.75 * h1, (h2, h1)

    def test_solve_matches_serial(self):
        m = 16
        A = laplacian_2d(m, m)
        u = np.ones(m * m)
        b = A @ u
        dec = DADecomp2D.create(m, m, dof=1, size=4)
        mat, part, q = sharded_aij_from_decomp(A, dec)
        bp = np.zeros(part.layout.n)
        bp[q] = b
        mesh = mesh_1d(4)
        pc = make_par_pc("bjacobi", mat, part)
        res = par_ksp_solve(mesh, mat, bp, pc=pc, ksp_type="cg",
                            rtol=1e-10)
        assert int(res.reason) > 0
        x = unshard_vector(res.x, part.layout)[q]
        np.testing.assert_allclose(x, u, atol=1e-7)
