"""Subcommunicator nesting (P8): concurrent subgroup solves on a 2-axis
mesh, and partition-informed sharding (P12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy, partition_rcm
from petsctpu.models import ex2_system, laplacian_2d
from petsctpu.parallel import par_ksp_solve
from petsctpu.parallel.pmat import sharded_aij_from_scipy
from petsctpu.parallel.api import unshard_vector
from petsctpu.parallel.subcomm import nested_mesh, sub_ksp_solve

multidev = pytest.mark.skipif(len(jax.devices()) < 4,
                              reason="needs >= 4 devices")


@multidev
class TestSubcomm:
    def test_two_concurrent_group_solves(self):
        """Two different systems solved at once, each on its own
        2-device subgroup — PetscSubcomm / PCHMPI execution shape."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        mesh = nested_mesh(2, np.asarray(jax.devices()[:4]))
        A1, b1, u1 = ex2_system(8, 8)
        A2 = (A1 + 0.7 * sp.eye(64)).tocsr()     # same shape, different op
        b2 = np.linspace(0.0, 1.0, 64)
        u2 = spla.spsolve(A2, b2)
        As, bs = [], []
        for A, b in ((A1, b1), (A2, b2)):
            Ash, part = sharded_aij_from_scipy(A, 2)
            As.append(Ash)
            bs.append(b)
        res = sub_ksp_solve(mesh, As, bs, ksp_type="cg", rtol=1e-10,
                            maxits=300)
        assert res.x.shape[0] == 2
        x1 = np.asarray(res.x[0])[:64]
        x2 = np.asarray(res.x[1])[:64]
        np.testing.assert_allclose(x1, u1, atol=1e-7)
        np.testing.assert_allclose(x2, u2, atol=1e-7)
        assert int(res.reason[0]) > 0 and int(res.reason[1]) > 0
        # the groups genuinely ran different problems
        assert int(res.its[0]) != int(res.its[1])

    def test_group_iterations_match_flat_runs(self):
        """Each subgroup's iteration count equals the same solve run on
        a plain 2-device mesh (subcomm = independent communicator)."""
        from jax.sharding import Mesh
        mesh = nested_mesh(2, np.asarray(jax.devices()[:4]))
        A, b, u = ex2_system(8, 8)
        Ash, part = sharded_aij_from_scipy(A, 2)
        res = sub_ksp_solve(mesh, [Ash, Ash], [b, b], ksp_type="cg",
                            rtol=1e-10, maxits=300)
        flat_mesh = Mesh(np.asarray(jax.devices()[:2]), ("rows",))
        flat = par_ksp_solve(flat_mesh, Ash, b, ksp_type="cg", rtol=1e-10,
                             maxits=300)
        assert int(res.its[0]) == int(res.its[1]) == int(flat.its)


@multidev
class TestPartitionedSharding:
    def test_perm_reduces_halo_and_matches(self):
        """MatPartitioning → distribution hook: a scrambled matrix
        sharded through its RCM partition permutation solves to the
        same answer and builds a smaller halo."""
        from jax.sharding import Mesh
        rng = np.random.default_rng(7)
        scram = rng.permutation(144)
        A = laplacian_2d(12, 12).tocsr()[scram][:, scram]
        b = rng.standard_normal(144)
        Pn = 4
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("rows",))
        # naive contiguous split of the scrambled numbering
        Ash0, part0 = sharded_aij_from_scipy(A, Pn)
        # partition-informed split
        part_ids = partition_rcm(A, Pn)
        perm = np.argsort(part_ids, kind="stable")
        Ash1, part1 = sharded_aij_from_scipy(A, Pn, perm=perm)
        assert part1.halo.gmax < part0.halo.gmax     # smaller ghost region
        r0 = par_ksp_solve(mesh, Ash0, b, ksp_type="cg", rtol=1e-10)
        r1 = par_ksp_solve(mesh, Ash1, b[perm], ksp_type="cg", rtol=1e-10)
        x0 = unshard_vector(r0.x, part0.layout)
        x1p = unshard_vector(r1.x, part1.layout)
        x1 = np.empty_like(x1p)
        x1[perm] = x1p                                # undo permutation
        np.testing.assert_allclose(x0, x1, atol=1e-8)
        serial = ksp_solve(aij_from_scipy(A), jnp.asarray(b), ksp_type="cg",
                           rtol=1e-10)
        np.testing.assert_allclose(x0, np.asarray(serial.x), atol=1e-8)


@multidev
def test_hmpi_inner_parallel_pc():
    """PCHMPI analog (pc/parallel.make_hmpi): the outer sequential
    Krylov loop applies an inner DISTRIBUTED solve as its PC — a
    near-exact inner solve makes the outer solver converge in O(1)
    iterations (the reference's outer-seq/inner-par split,
    src/ksp/pc/impls/openmp)."""
    import scipy.sparse as sp

    from petsctpu.core.options import Options
    from petsctpu.ksp import ksp_solve
    from petsctpu.mat import aij_from_scipy
    from petsctpu.models import ex2_system
    from petsctpu.pc import make_pc

    A, b, u = ex2_system(16, 16)
    A = sp.csr_matrix(A)
    pc = make_pc("hmpi", A_host=A,
                 options=Options({"hmpi_ksp_rtol": "1e-10"}))
    Ad = aij_from_scipy(A)
    r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                  rtol=1e-8, maxits=50)
    assert int(r.reason) > 0
    assert int(r.its) <= 3, int(r.its)
    np.testing.assert_allclose(np.asarray(r.x), u, atol=1e-8)


def test_shell_pc():
    """PCShell: user callback (ctx, x) -> z through make_pc."""
    import scipy.sparse as sp

    from petsctpu.core.options import Options
    from petsctpu.ksp import ksp_solve
    from petsctpu.mat import aij_from_scipy
    from petsctpu.models import ex2_system
    from petsctpu.pc import make_pc

    A, b, u = ex2_system(10, 10)
    dinv = jnp.asarray(1.0 / sp.csr_matrix(A).diagonal())
    pc = make_pc("shell", options=Options({
        "pc_shell_ctx": dinv,
        "pc_shell_apply": lambda ctx, x: ctx * x}))
    Ad = aij_from_scipy(sp.csr_matrix(A))
    r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg",
                  rtol=1e-10, maxits=500)
    assert int(r.reason) > 0
    np.testing.assert_allclose(np.asarray(r.x), u, atol=1e-7)
