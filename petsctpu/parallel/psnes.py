"""Distributed nonlinear solves: SNES / TS under shard_map.

This closes the loop the reference calls "running SNES on a
communicator": SNESSolve (src/snes/interface/snes.c:3585) evaluating
residuals through DMDA ghost scatters (src/dm/interface/dm.c:1620),
assembling the Jacobian by FD coloring (SNESDefaultComputeJacobianColor
src/snes/snesj2.c:36 -> MatFDColoringApply src/mat/matfd/fdmatrix.c)
where every perturbed residual evaluation carries its own halo
exchange, and solving J dx = F with a distributed KSP + PC
(BASELINE.json config 5: Newton-Krylov with GMRES+GAMG, ex19-style).

TPU mapping: the axis-parametric `snes_solve` / `ts_solve` (ONE
`lax.while_loop` program each) runs verbatim INSIDE `shard_map` over
the device mesh — residual halos are `lax.ppermute`, reductions are
`psum`, and the colored-FD assembly emits a per-shard local
`ShardedStencil` Jacobian whose SpMV exchanges halos exactly like the
reference's MatMult_MPIAIJ (mpiaij.c:1102). The entire distributed
Newton solve is a single XLA computation with zero host round-trips.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from petsctpu.ksp.common import KSPConfig
from petsctpu.parallel.api import _local, _pc_specs
from petsctpu.parallel.pstencil import ShardedStencil
from petsctpu.snes.api import SNESConfig, SNESResult, snes_solve
from petsctpu.ts.steppers import TSConfig, TSResult, ts_solve


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedFDJac:
    """Colored-FD Jacobian plan for a sharded grid residual.

    The reference builds the coloring from the DMDA stencil
    (src/dm/impls/da/fdda.c) and MatFDColoringApply perturbs all
    columns of one color at once — each color costs one residual
    evaluation, i.e. one halo exchange. Here the plan is built ONCE on
    host from the global stencil pattern (a greedy distance-2 coloring
    of the TRUE-grid pattern, mat/coloring.greedy_color); `assemble`
    is pure device code inside shard_map: a `lax.map` over the color
    indicators evaluates all perturbed residuals, and the entries land
    in the local stencil coefficient slabs by gathers
    (vals[d,i] = (F_c[colj[d,i], i] - F0[i]) / h).

    Leaves are stacked [P, ...] like ShardedStencil; `.local()` strips
    the shard axis inside shard_map. Rows past the true grid (leading-
    axis padding) must have identity residual F(x)=x there — the FD
    then reproduces the identity pad rows of the sharded operators.
    """

    color: jax.Array       # [P, nloc] int32 color of my columns
    colj: jax.Array        # [P, D, nloc] color of target column per offset
    ok: jax.Array          # [P, D, nloc] bool: target inside TRUE grid
    offsets: tuple = field(metadata=dict(static=True))
    grid: tuple = field(metadata=dict(static=True))     # padded global
    nshards: int = field(metadata=dict(static=True), default=1)
    axis: str = field(metadata=dict(static=True), default="rows")
    halo: int = field(metadata=dict(static=True), default=1)
    ncolors: int = field(metadata=dict(static=True), default=1)

    @property
    def n_pad(self) -> int:
        return int(np.prod(self.grid))

    def local(self) -> "ShardedFDJac":
        return jax.tree.map(lambda a: a[0], self)

    @classmethod
    def plan(cls, grid_true, offsets, nshards: int, mloc: int = None,
             axis: str = "rows") -> "ShardedFDJac":
        """grid_true: TRUE global grid (leading axis gets padded to
        nshards*mloc); offsets: nd-tuples covering every true
        dependency of the residual (a superset is fine — spurious
        entries FD to zero but do widen the coloring)."""
        import scipy.sparse as sp
        from petsctpu.mat.coloring import greedy_color

        grid_true = tuple(grid_true)
        m = grid_true[0]
        rest = grid_true[1:]
        if mloc is None:
            mloc = -(-m // nshards)
        assert mloc * nshards >= m, (mloc, nshards, m)
        m_pad = mloc * nshards
        grid = (m_pad,) + rest
        n_pad = int(np.prod(grid))
        nd = len(grid)
        offsets = tuple(tuple(int(o) for o in off) for off in offsets)
        assert any(all(o == 0 for o in off) for off in offsets), \
            "offsets must include the diagonal"
        halo = max(abs(off[0]) for off in offsets) or 1

        multi = np.stack(np.unravel_index(np.arange(n_pad), grid), axis=1)
        strides = np.array([int(np.prod(grid[k + 1:])) for k in range(nd)])
        true_row = multi[:, 0] < m
        gb = np.array(grid_true)

        D = len(offsets)
        colj = np.zeros((D, n_pad), np.int32)
        ok = np.zeros((D, n_pad), bool)
        rows_p, cols_p = [], []
        diag_d = next(d for d, off in enumerate(offsets)
                      if all(o == 0 for o in off))
        for d, off in enumerate(offsets):
            tgt = multi + np.array(off)
            inside = np.all((tgt >= 0) & (tgt < gb), axis=1) & true_row
            ok[d] = inside
            col = np.where(inside, tgt @ strides, 0)
            colj[d] = col
            rows_p.append(np.arange(n_pad)[inside])
            cols_p.append(col[inside])
        # pad rows: identity (diag only)
        ok[diag_d] |= ~true_row
        colj[diag_d] = np.where(true_row, colj[diag_d], np.arange(n_pad))
        rows_p.append(np.arange(n_pad)[~true_row])
        cols_p.append(np.arange(n_pad)[~true_row])

        r = np.concatenate(rows_p)
        c = np.concatenate(cols_p)
        pattern = sp.coo_matrix((np.ones(len(r)), (r, c)),
                                shape=(n_pad, n_pad)).tocsr()
        colors = greedy_color(pattern).astype(np.int32)
        colj = colors[colj]                       # color of target column

        nloc = n_pad // nshards
        return cls(
            jnp.asarray(colors.reshape(nshards, nloc)),
            jnp.asarray(colj.reshape(D, nshards, nloc).swapaxes(0, 1)),
            jnp.asarray(ok.reshape(D, nshards, nloc).swapaxes(0, 1)),
            offsets, grid, nshards, axis, halo,
            int(colors.max()) + 1)

    # -- device (inside shard_map, on .local()) -----------------------------
    def assemble(self, F: Callable, x: jax.Array, Fx: jax.Array,
                 h: float = None) -> ShardedStencil:
        dtype = x.dtype
        hval = jnp.asarray(h if h is not None
                           else np.sqrt(np.finfo(np.dtype(dtype)).eps),
                           dtype)
        nloc = x.shape[0]
        mloc = self.grid[0] // self.nshards
        rest = self.grid[1:]

        def one_color(c):
            d = (self.color == c).astype(dtype)
            return F(x + hval * d)

        Fb = lax.map(one_color, jnp.arange(self.ncolors))     # [C, nloc]
        rows = jnp.arange(nloc)
        coeffs = []
        for d in range(len(self.offsets)):
            v = (Fb[self.colj[d], rows] - Fx) / hval
            v = jnp.where(self.ok[d], v, jnp.zeros((), dtype))
            coeffs.append(v.reshape((mloc,) + rest))
        return ShardedStencil(jnp.stack(coeffs), self.offsets, self.grid,
                              self.nshards, self.axis, self.halo)


def pad_shard(mesh: Mesh, axis: str, x, n_pad: int):
    """Pad a true global vector to the sharded padded size and place
    it row-sharded on the mesh (pad entries zero)."""
    xh = np.asarray(x)
    xp = np.zeros(n_pad, xh.dtype)
    xp[: xh.shape[0]] = xh
    return jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P(axis)))


_PSNES_CACHE: dict = {}


def _jac_specs(jac, axis):
    if isinstance(jac, ShardedFDJac):
        return jax.tree.map(lambda _: P(axis), jac)
    return None


def par_snes_solve(mesh: Mesh, F_local: Callable, x0, jac=None, pc=None,
                   cfg: SNESConfig = None, ksp_cfg: KSPConfig = None,
                   axis: str = "rows", n_pad: int = None,
                   **kw) -> SNESResult:
    """Distributed Newton-Krylov solve of F(x) = 0 over the mesh.

    F_local: per-shard residual (halo exchange via ppermute inside);
    x0: TRUE global vector (host) or already-sharded padded array;
    jac: ShardedFDJac plan (colored per-shard assembly), "jvp"
         (matrix-free through the halos), or a callable (x, Fx) -> op;
    pc: a distributed PC pytree (DistMGPC / stacked bjacobi / ...) —
        lagged: built once at setup, reused every Newton step, the
        -snes_lag_preconditioner pattern.
    """
    from dataclasses import replace
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    ksp_cfg = ksp_cfg or KSPConfig(ksp_type="gmres", rtol=1e-5, maxits=200)
    if n_pad is None:
        n_pad = jac.n_pad if isinstance(jac, ShardedFDJac) else None
    if isinstance(x0, np.ndarray) or (n_pad is not None
                                      and x0.shape[0] != n_pad):
        x0 = pad_shard(mesh, axis, x0, n_pad)

    jac_is_plan = isinstance(jac, ShardedFDJac)
    key = (id(F_local), cfg, ksp_cfg, axis,
           jac if not jac_is_plan and not callable(jac) else id(jac),
           id(pc), tuple(d.id for d in mesh.devices.flat))
    run = _PSNES_CACHE.get(key)
    if run is None:
        jspec = _jac_specs(jac, axis)
        pspec = _pc_specs(pc, axis)

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), jspec, pspec),
            out_specs=SNESResult(P(axis), P(), P(), P(), P()),
            check_vma=False)
        def run(x0_loc, jac_st, pc_st):
            pc_loc = _local(pc_st)
            jfun = jac_st.local() if jac_st is not None else jac
            pb = (lambda J: pc_loc) if pc_loc is not None else None
            return snes_solve(F_local, x0_loc, jac=jfun, pc_builder=pb,
                              ksp_cfg=ksp_cfg, cfg=cfg, axis=axis)

        _PSNES_CACHE[key] = run
    return run(x0, jac if jac_is_plan else None, pc)


def par_ts_solve(mesh: Mesh, rhs: Optional[Callable], u0,
                 cfg: TSConfig = None, jac=None, pc=None,
                 ifunc: Callable = None, axis: str = "rows",
                 n_pad: int = None, **kw) -> TSResult:
    """Distributed time integration (TSSolve ts.c:2388 over a
    communicator): the axis-parametric ts_solve runs inside shard_map;
    implicit steppers' inner Newton solves assemble per-shard colored
    Jacobians and smooth through the same halos."""
    from dataclasses import replace
    cfg = replace(cfg or TSConfig(), **kw) if kw else (cfg or TSConfig())
    if n_pad is None:
        n_pad = jac.n_pad if isinstance(jac, ShardedFDJac) else None
    if isinstance(u0, np.ndarray) or (n_pad is not None
                                      and u0.shape[0] != n_pad):
        u0 = pad_shard(mesh, axis, u0, n_pad)

    jac_is_plan = isinstance(jac, ShardedFDJac)
    jspec = _jac_specs(jac, axis)
    pspec = _pc_specs(pc, axis)
    nhist = (cfg.max_steps + 1 if cfg.ts_type == "pseudo" else 0)
    out_specs = TSResult(P(axis), P(), P(), P(),
                         P() if nhist else None, P() if nhist else None)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), jspec, pspec),
        out_specs=out_specs, check_vma=False)
    def run(u0_loc, jac_st, pc_st):
        pc_loc = _local(pc_st)
        # a local plan flows through ts_solve -> snes_solve, whose
        # build_J duck-types .assemble and FDs the theta STAGE residual
        # G (diag + rhs sparsity — the plan's offsets must include the
        # diagonal, which ShardedFDJac.plan enforces)
        jfun = jac_st.local() if jac_st is not None else jac
        pb = (lambda J: pc_loc) if pc_loc is not None else None
        return ts_solve(rhs, u0_loc, cfg=cfg, jac=jfun, pc_builder=pb,
                        ifunc=ifunc, axis=axis)

    return run(u0, jac if jac_is_plan else None, pc)
