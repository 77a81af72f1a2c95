"""Two-level (DCN-aware) halo plans over an (H hosts × C chips) mesh.

The multi-host analog of the reference's hierarchical comm patterns
(PCHMPI outer/inner nesting, GAMG proc agglomeration — SURVEY §5.7):
phase-1 all_to_all over "ici" within a host, phase-2 rail-aligned
all_to_all over "dcn" between same-chip-index peers. Tested on an
8-device CPU mesh shaped (2, 4) — 2 virtual hosts × 4 chips.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from petsctpu.models import laplacian_2d
from petsctpu.parallel.hier import sharded_aij_hier_from_scipy

H, C = 2, 4


def _mesh():
    devs = np.array(jax.devices()[:H * C]).reshape(H, C)
    return Mesh(devs, ("dcn", "ici"))


def _random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    # irregular sparsity so ghosts cross hosts AND chips
    A = sp.random(n, n, density=0.08, random_state=rng, format="csr")
    A = A + A.T + sp.diags(np.full(n, 4.0))
    return sp.csr_matrix(A)


class TestHierHalo:
    def test_mult_matches_scipy(self):
        A = _random_spd(96)
        Ah, part = sharded_aij_hier_from_scipy(A, H, C, dtype=np.float64)
        mesh = _mesh()
        x = np.random.default_rng(1).standard_normal(A.shape[0])
        xp = part.layout.pad_vector(x)

        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(("dcn", "ici")), P(("dcn", "ici"))),
                           out_specs=P(("dcn", "ici")), check_vma=False)
        def mult(Ast, xl):
            return Ast.local().mult(xl)

        y = np.asarray(mult(Ah, jnp.asarray(xp)))[: A.shape[0]]
        np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-12)

    def test_mult_transpose_matches_scipy(self):
        A = _random_spd(80, seed=3)
        # make it nonsymmetric so multT is a real check
        A = A + sp.triu(sp.random(80, 80, density=0.03,
                                  random_state=np.random.default_rng(5),
                                  format="csr"))
        A = sp.csr_matrix(A)
        Ah, part = sharded_aij_hier_from_scipy(A, H, C, dtype=np.float64)
        mesh = _mesh()
        x = np.random.default_rng(2).standard_normal(A.shape[0])
        xp = part.layout.pad_vector(x)

        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(("dcn", "ici")), P(("dcn", "ici"))),
                           out_specs=P(("dcn", "ici")), check_vma=False)
        def multT(Ast, xl):
            return Ast.local().multT(xl)

        y = np.asarray(multT(Ah, jnp.asarray(xp)))[: A.shape[0]]
        np.testing.assert_allclose(y, A.T @ x, rtol=1e-12, atol=1e-12)

    def test_dcn_messages_are_rail_aligned(self):
        """Structural property: phase 2 exchanges [H, s2max] buffers —
        each chip sends exactly one (possibly empty) DCN message per
        remote host, never H·C − C."""
        A = _random_spd(64, seed=7)
        Ah, _ = sharded_aij_hier_from_scipy(A, H, C)
        assert Ah.send2_src.shape[1] == H
        assert Ah.send1_idx.shape[1] == C

    def test_par_cg_solve_on_hier_mesh(self):
        """Full distributed CG over the 2-axis mesh (psum over both
        axes) matches the serial solution."""
        from petsctpu.parallel.api import par_ksp_solve, unshard_vector

        A = laplacian_2d(12, 12)
        Ah, part = sharded_aij_hier_from_scipy(A, H, C, dtype=np.float64)
        mesh = _mesh()
        b = A @ np.ones(144)
        r = par_ksp_solve(mesh, Ah, b, ksp_type="cg", rtol=1e-10,
                          maxits=300)
        assert bool(np.asarray(r.converged).reshape(-1)[0])
        x = unshard_vector(r.x, part.layout)
        np.testing.assert_allclose(x, 1.0, atol=1e-8)
