"""Sharded stencil matrices: structured-grid SPMD with ppermute halos.

This is the TPU analog of the reference's DMDA ghost exchange
(src/dm/impls/da/da2.c:664 — ghost scatters sized by stencil width):
the grid's slowest axis is sharded over the mesh; each apply exchanges
`w` boundary rows with the two neighbor shards via `lax.ppermute`
(pure ICI neighbor traffic, no all-to-all), then applies the stencil
with pad+slice shifts exactly like the serial StencilMat. Unmatched
ppermute partners (grid boundary) receive zeros — which is precisely
the out-of-grid value.

Supports any offsets with |offset₀| ≤ halo width (star or box; box
corner values ride along with full-row halos).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from petsctpu.mat.stencil import StencilMat, _shift


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedStencil:
    """Leading axis = shard: coeffs [P, D, mloc, *rest]."""

    coeffs: jax.Array
    offsets: tuple = field(metadata=dict(static=True))
    grid: tuple = field(metadata=dict(static=True))       # global (padded)
    nshards: int = field(metadata=dict(static=True), default=1)
    axis: str = field(metadata=dict(static=True), default="rows")
    halo: int = field(metadata=dict(static=True), default=1)

    @property
    def shape(self):
        n = int(np.prod(self.grid))
        return (n, n)

    @property
    def dtype(self):
        return self.coeffs.dtype

    @property
    def mloc(self):
        return self.grid[0] // self.nshards

    def local(self) -> "ShardedStencil":
        return jax.tree.map(lambda a: a[0], self)

    # -- halo exchange ----------------------------------------------------
    def _exchange(self, xg):
        """Returns xg extended with halo rows: [mloc+2w, *rest]."""
        w = self.halo
        P = self.nshards
        fwd = [(i, i + 1) for i in range(P - 1)]    # my last rows → next
        bwd = [(i + 1, i) for i in range(P - 1)]    # my first rows → prev
        from_above = lax.ppermute(xg[-w:], self.axis, fwd)
        from_below = lax.ppermute(xg[:w], self.axis, bwd)
        return jnp.concatenate([from_above, xg, from_below], axis=0)

    # -- ops ---------------------------------------------------------------
    def mult(self, x_local: jax.Array) -> jax.Array:
        w = self.halo
        rest = self.grid[1:]
        xg = x_local.reshape((self.mloc,) + rest)
        if self.nshards > 1:
            xs = self._exchange(xg)
        else:
            pads = [(w, w)] + [(0, 0)] * len(rest)
            xs = jnp.pad(xg, pads)
        C = self.coeffs
        y = jnp.zeros_like(xg)
        for d, off in enumerate(self.offsets):
            # row offset handled on the extended slab; others via _shift
            o0 = int(off[0])
            sl = xs[w + o0: w + o0 + self.mloc]
            if any(o != 0 for o in off[1:]):
                sl = _shift(sl, (0,) + tuple(off[1:]))
            y = y + C[d] * sl
        return y.reshape(-1)

    def diagonal(self) -> jax.Array:
        for d, off in enumerate(self.offsets):
            if all(o == 0 for o in off):
                return self.coeffs[d].reshape(-1)
        return jnp.zeros(self.mloc * int(np.prod(self.grid[1:])), self.dtype)

    def flops_per_mult(self) -> float:
        n = int(np.prod(self.grid))
        return 2.0 * n * len(self.offsets) - n


def sharded_stencil_from(S: StencilMat, nshards: int,
                         axis: str = "rows") -> ShardedStencil:
    """Partition a StencilMat over the leading grid axis. The axis is
    padded to a multiple of nshards with identity rows (diag 1)."""
    m = S.grid[0]
    rest = tuple(S.grid[1:])
    mloc = -(-m // nshards)
    m_pad = mloc * nshards
    C = np.asarray(S.coeffs)
    D = C.shape[0]
    halo = max(abs(int(o[0])) for o in S.offsets) or 1
    if m_pad != m:
        Cp = np.zeros((D, m_pad) + rest, C.dtype)
        Cp[:, :m] = C
        diag_d = next(d for d, off in enumerate(S.offsets)
                      if all(o == 0 for o in off))
        Cp[diag_d, m:] = 1.0
        C = Cp
    # stack per shard: [P, D, mloc, *rest]
    C = C.reshape((D, nshards, mloc) + rest).swapaxes(0, 1)
    return ShardedStencil(jnp.asarray(np.ascontiguousarray(C)), S.offsets,
                          (m_pad,) + rest, nshards, axis, halo)
