"""Distributed geometric multigrid: sharded fine level + agglomerated
coarse hierarchy.

Reference pattern: GAMG's coarse-grid agglomeration onto fewer ranks
(src/ksp/pc/impls/gamg/gamg.c:131-198 createLevel with
-pc_gamg_repartition / proc reduction) — tiny levels must not be
latency-dominated. TPU mapping (SURVEY §5.7): the FINE level smooths
in SPMD (ShardedStencil Chebyshev — zero collectives per sweep); one
`all_gather` per cycle brings the fine residual to every shard, and
the whole coarse hierarchy runs REPLICATED (identical redundant
compute, the PCREDUNDANT idea) — no further communication below the
fine level.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax

from petsctpu.core.options import Options
from petsctpu.dm.da import DA, Q1Interp, q1_interp_scipy
from petsctpu.pc.mg import MGPC, ChebySmoother, _cheby_smoother, \
    make_geometric_mg
from petsctpu.parallel.pstencil import ShardedStencil, sharded_stencil_from


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistMGPC:
    """One V-cycle: sharded fine smoothing + replicated coarse solve."""

    A: ShardedStencil            # fine operator (stacked shard axis)
    smoother: ChebySmoother      # dinv stacked [P, nloc]
    P_t: Q1Interp                # full-grid fine↔coarse transfer
    coarse: MGPC                 # replicated coarse hierarchy
    grid: tuple = field(metadata=dict(static=True))     # true fine grid
    axis: str = field(metadata=dict(static=True), default="rows")
    nshards: int = field(metadata=dict(static=True), default=1)

    def shard_specs(self, axis):
        """Mixed layout: A/smoother stacked per shard; transfers and the
        coarse hierarchy replicated on every shard."""
        from jax.sharding import PartitionSpec as PS
        sh, rep = PS(axis), PS()
        return DistMGPC(
            A=jax.tree.map(lambda _: sh, self.A),
            smoother=jax.tree.map(lambda _: sh, self.smoother),
            P_t=jax.tree.map(lambda _: rep, self.P_t),
            coarse=jax.tree.map(lambda _: rep, self.coarse),
            grid=self.grid, axis=self.axis, nshards=self.nshards)

    def local(self) -> "DistMGPC":
        # strip ONLY the stacked leaves (A, smoother); coarse hierarchy
        # and transfers are replicated (unstacked)
        A = jax.tree.map(lambda a: a[0], self.A)
        sm = jax.tree.map(lambda a: a[0], self.smoother)
        return DistMGPC(A, sm, self.P_t, self.coarse, self.grid, self.axis,
                        self.nshards)

    def apply(self, b):
        A = self.A
        x = self.smoother.smooth(A, b, jnp.zeros_like(b))
        r = b - A.mult(x)
        rfull = lax.all_gather(r, self.axis, tiled=True)   # padded global
        ntrue = int(np.prod(self.grid))
        rc = self.P_t.multT(rfull[:ntrue])
        xc = self.coarse.apply(rc)                         # replicated
        xf = self.P_t.mult(xc)
        xf = jnp.concatenate([xf, jnp.zeros(rfull.shape[0] - ntrue,
                                            xf.dtype)])
        nloc = b.shape[0]
        me = lax.axis_index(self.axis)
        x = x + lax.dynamic_slice(xf, (me * nloc,), (nloc,))
        x = self.smoother.smooth(A, b, x)
        return x


def make_dist_mg(A_host, grid, nshards: int, dtype=None,
                 options: Options = None) -> DistMGPC:
    """Build: sharded fine stencil + Chebyshev smoother; Galerkin coarse
    operator; serial MGPC below (PCSetUp_MG + agglomeration analog)."""
    from petsctpu.mat.stencil import stencil_from_scipy

    opts = options or Options()
    dtype = np.dtype(dtype or A_host.dtype).type
    da = DA(tuple(grid))
    S = stencil_from_scipy(A_host, tuple(grid), dtype=dtype)
    Sh = sharded_stencil_from(S, nshards)

    # stacked smoother: diag of padded grid (identity rows → dinv = 1)
    d = np.ones(Sh.shape[0], dtype)
    d[: np.prod(grid)] = sp.csr_matrix(A_host).diagonal()
    d = np.where(d != 0, d, 1.0)
    sm_its = opts.get_int("mg_levels_ksp_max_it", 2)
    from petsctpu.pc.mg import _power_lambda_max
    lam = _power_lambda_max(sp.csr_matrix(A_host), 1.0 / d[: np.prod(grid)])
    P = nshards
    smoother = ChebySmoother(
        jnp.asarray((1.0 / d).reshape(P, -1)),
        jnp.broadcast_to(jnp.asarray(dtype(0.1 * lam)), (P,)),
        jnp.broadcast_to(jnp.asarray(dtype(1.1 * lam)), (P,)), sm_its)

    coarse_da = da.coarsen()
    Pt = da.interpolation(coarse_da)
    Ps = q1_interp_scipy(tuple(grid), coarse_da.grid)
    Ac = (Ps.T @ sp.csr_matrix(A_host) @ Ps).tocsr()
    coarse = make_geometric_mg(Ac, coarse_da, dtype=dtype, options=opts)
    return DistMGPC(Sh, smoother, Pt, coarse, tuple(grid), Sh.axis,
                    nshards)
