"""Matrix coloring for FD Jacobians.

Reference: src/mat/color/color.c (greedy SL/LF/ID algorithms, Minpack-
derived) feeding MatFDColoring (src/mat/matfd/fdmatrix.c): columns of
one color can be perturbed together. Host-side greedy distance-2
coloring over the column-intersection graph.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def greedy_color(A) -> np.ndarray:
    """Color columns so no two columns sharing a row get one color.

    Returns int32 color[ncols]; ncolors = color.max()+1. Equivalent to
    greedy coloring of the graph of AᵀA (distance-2 in the bipartite
    row-col graph)."""
    A = sp.csc_matrix(A)
    n = A.shape[1]
    Acsr = A.tocsr()

    from petsctpu import native
    if native.available():
        return native.greedy_color(Acsr.indptr.astype(np.int64),
                                   Acsr.indices.astype(np.int32),
                                   A.indptr.astype(np.int64),
                                   A.indices.astype(np.int32),
                                   A.shape[0], n)

    color = np.full(n, -1, dtype=np.int32)
    # column j conflicts with all columns appearing in rows of column j
    for j in range(n):
        rows = A.indices[A.indptr[j]:A.indptr[j + 1]]
        used = set()
        for r in rows:
            cols = Acsr.indices[Acsr.indptr[r]:Acsr.indptr[r + 1]]
            for c in cols:
                if color[c] >= 0:
                    used.add(color[c])
        c = 0
        while c in used:
            c += 1
        color[j] = c
    return color


def stencil_coloring(grid, offsets) -> np.ndarray:
    """Closed-form distance-2 coloring for stencil patterns: color =
    position modulo the stencil bounding box (what fdda.c exploits for
    DMDA matrices — O(stencil volume) colors independent of n)."""
    grid = tuple(grid)
    widths = []
    nd = len(grid)
    for k in range(nd):
        w = 2 * max(abs(o[k]) for o in offsets) + 1
        widths.append(w)
    idx = np.indices(grid)        # [nd, *grid]
    color = np.zeros(grid, dtype=np.int32)
    mult = 1
    for k in range(nd - 1, -1, -1):
        color += (idx[k] % widths[k]) * mult
        mult *= widths[k]
    return color.reshape(-1)
