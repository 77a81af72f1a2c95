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
        # nested-dissection proxy: COLAMD column ordering of AᵀA
        from scipy.sparse.linalg import splu
        lu = splu(A.tocsc(), permc_spec="NATURAL")
        del lu
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        S = ((A + A.T) != 0).astype(np.int8).tocsr()
        return np.asarray(reverse_cuthill_mckee(S), dtype=np.int64)
    raise ValueError(f"unknown ordering {kind!r} (natural|rcm|nd)")


def permute_symmetric(A, perm: np.ndarray):
    """A → A[perm][:, perm] (MatPermute analog)."""
    A = sp.csr_matrix(A)
    return A[perm][:, perm].tocsr()


def bandwidth(A) -> int:
    A = sp.coo_matrix(A)
    if A.nnz == 0:
        return 0
    return int(np.abs(A.row - A.col).max())
