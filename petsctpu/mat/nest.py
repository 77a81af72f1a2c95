"""MATNEST — block matrix of sub-operators, and submatrix extraction.

Reference: src/mat/impls/nest (block systems for fieldsplit) and
MatGetSubMatrix (src/mat/interface/matrix.c). Nest keeps blocks as
independent operators; mult gathers per-field slices, applies each
block, scatter-adds into row fields. Works with contiguous or general
index sets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Nest:
    """blocks[i][j] — operator or None; row_is/col_is — index arrays."""

    blocks: Tuple              # tuple of tuples (pytree)
    row_is: Tuple              # tuple of int32 arrays
    col_is: Tuple
    n_rows: int = field(metadata=dict(static=True))
    n_cols: int = field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def mult(self, x):
        y = jnp.zeros(self.n_rows, x.dtype)
        for bi, ris in enumerate(self.row_is):
            acc = None
            for bj, cis in enumerate(self.col_is):
                B = self.blocks[bi][bj]
                if B is None:
                    continue
                v = B.mult(x[cis])
                acc = v if acc is None else acc + v
            if acc is not None:
                y = y.at[ris].set(acc)
        return y

    def multT(self, x):
        y = jnp.zeros(self.n_cols, x.dtype)
        for bj, cis in enumerate(self.col_is):
            acc = None
            for bi, ris in enumerate(self.row_is):
                B = self.blocks[bi][bj]
                if B is None:
                    continue
                v = B.multT(x[ris])
                acc = v if acc is None else acc + v
            if acc is not None:
                y = y.at[cis].set(acc)
        return y

    def diagonal(self):
        d = jnp.zeros(self.n_rows,
                      next(b for row in self.blocks for b in row
                           if b is not None).dtype)
        for bi, ris in enumerate(self.row_is):
            B = self.blocks[bi][bi] if bi < len(self.col_is) else None
            if B is not None:
                d = d.at[ris].set(B.diagonal())
        return d


def make_nest(blocks, row_sizes=None) -> Nest:
    """Build a Nest from a 2-D list of operators (None = zero block),
    with contiguous field layout."""
    nb = len(blocks)
    mb = len(blocks[0])
    rs = [next(b.shape[0] for b in row if b is not None) for row in blocks]
    cs = []
    for j in range(mb):
        cs.append(next(blocks[i][j].shape[1] for i in range(nb)
                       if blocks[i][j] is not None))
    roff = np.concatenate([[0], np.cumsum(rs)])
    coff = np.concatenate([[0], np.cumsum(cs)])
    row_is = tuple(jnp.arange(roff[i], roff[i + 1], dtype=jnp.int32)
                   for i in range(nb))
    col_is = tuple(jnp.arange(coff[j], coff[j + 1], dtype=jnp.int32)
                   for j in range(mb))
    return Nest(tuple(tuple(r) for r in blocks), row_is, col_is,
                int(roff[-1]), int(coff[-1]))


def get_submatrix(A_host, row_is, col_is=None):
    """MatGetSubMatrix analog (host): A[rows, cols] as scipy CSR."""
    import scipy.sparse as sp

    r = np.asarray(row_is.indices if hasattr(row_is, "indices") else row_is)
    c = (np.asarray(col_is.indices if hasattr(col_is, "indices") else col_is)
         if col_is is not None else r)
    return sp.csr_matrix(A_host)[np.ix_(r, c)].tocsr()
