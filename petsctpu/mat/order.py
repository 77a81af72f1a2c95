"""Fill-reducing / bandwidth orderings.

Reference: src/mat/order (MatGetOrdering sorder.c:182; RCM genrcm.c,
nested dissection gennd.c, 1WD, QMD — SPARSPAK-derived). Provided:
natural, rcm (native C++ or scipy csgraph), nd (via scipy COLAMD
proxy). Orderings permute factorizations: ILU/Cholesky quality often
improves markedly under RCM.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def get_ordering(A, kind: str = "natural") -> np.ndarray:
    """Returns perm such that A[perm][:, perm] is the reordered matrix
    (row permutation = column permutation, symmetric ordering)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    if kind in ("natural", ""):
        return np.arange(n)
    if kind == "rcm":
        from petsctpu import native
        S = ((A + A.T) != 0).astype(np.int8).tocsr()
        if native.available():
            return native.rcm(S.indptr.astype(np.int64),
                              S.indices.astype(np.int32)).astype(np.int64)
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        return np.asarray(reverse_cuthill_mckee(S), dtype=np.int64)
    if kind == "nd":
        S = ((A + A.T) != 0).astype(np.int8).tocsr()
        return nested_dissection(S)
    if kind in ("qmd", "md"):
        S = ((A + A.T) != 0).astype(np.int8).tocsr()
        return minimum_degree(S)
    raise ValueError(f"unknown ordering {kind!r} (natural|rcm|nd|qmd)")


def minimum_degree(S: sp.csr_matrix) -> np.ndarray:
    """Greedy minimum-degree elimination ordering (the role of
    SPARSPAK's genqmd, src/mat/order/genqmd.c — quotient-graph
    bookkeeping replaced by explicit elimination-graph sets, adequate
    at plan time). At each step the minimum-degree node is eliminated
    and its neighbors are clique-connected."""
    n = S.shape[0]
    # invariant: adj[u] holds only ALIVE neighbors of u
    adj = [set(S.indices[S.indptr[i]:S.indptr[i + 1]]) - {i}
           for i in range(n)]
    perm = np.empty(n, np.int64)
    deg = np.array([len(a) for a in adj], np.float64)
    for k in range(n):
        i = int(np.argmin(deg))
        perm[k] = i
        deg[i] = np.inf
        nbrs = adj[i]
        for u in nbrs:
            adj[u].discard(i)
        for u in nbrs:
            adj[u] |= nbrs
            adj[u].discard(u)
            deg[u] = len(adj[u])
        adj[i] = set()
    return perm


def nested_dissection(S, leaf: int = 24) -> np.ndarray:
    """Recursive nested dissection (gennd.c analog): bisect the graph
    along an RCM-band cut, peel the vertex separator off the second
    half, recurse on the halves, number the separator LAST — the
    ordering whose elimination tree direct solvers want."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    S = sp.csr_matrix(S)

    def rec(idx: np.ndarray) -> np.ndarray:
        if idx.size <= leaf:
            sub = S[idx][:, idx]
            return idx[np.asarray(reverse_cuthill_mckee(sub),
                                  dtype=np.int64)]
        sub = S[idx][:, idx].tocsr()
        order = np.asarray(reverse_cuthill_mckee(sub), dtype=np.int64)
        half = idx.size // 2
        a_loc, b_loc = order[:half], order[half:]
        in_a = np.zeros(idx.size, bool)
        in_a[a_loc] = True
        # separator: b-side vertices adjacent to the a side
        rows_b = sub[b_loc]
        touches_a = np.asarray(
            (rows_b[:, a_loc].getnnz(axis=1) > 0)).ravel()
        sep_loc = b_loc[touches_a]
        rest_loc = b_loc[~touches_a]
        parts = [rec(idx[a_loc])]
        if rest_loc.size:
            parts.append(rec(idx[rest_loc]))
        if sep_loc.size:
            parts.append(idx[sep_loc])
        return np.concatenate(parts)

    return rec(np.arange(S.shape[0], dtype=np.int64))


def permute_symmetric(A, perm: np.ndarray):
    """A → A[perm][:, perm] (MatPermute analog)."""
    A = sp.csr_matrix(A)
    return A[perm][:, perm].tocsr()


def bandwidth(A) -> int:
    A = sp.coo_matrix(A)
    if A.nnz == 0:
        return 0
    return int(np.abs(A.row - A.col).max())
