"""Implicit-operator wrappers (matrix-free composition).

The reference has a family of wrapper Mat types — MATSHELL (user
callback), MATTRANSPOSE, MATNORMAL (AᵀA implicit), MATCOMPOSITE (ΣAᵢ or
product), MATLRC (A + U C Vᵀ) — see src/mat/impls/{shell,transpose,
normal,composite,lrc} and SURVEY.md §2.3. On TPU these are just pytree
dataclasses whose `mult` composes other operators' `mult`; XLA fuses
the arithmetic, so implicit operators are essentially free.

Any object with `.shape` and `.mult(x)` is an operator; `.multT(x)` is
optional. Solvers are generic over this protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Shell:
    """User-callback operator (MATSHELL, src/mat/impls/shell).

    `mult_fn(ctx, x)` — ctx is an arbitrary pytree of arrays.
    """

    ctx: Any
    mult_fn: Callable = field(metadata=dict(static=True))
    shape: tuple = field(metadata=dict(static=True))
    multT_fn: Optional[Callable] = field(metadata=dict(static=True), default=None)
    diag_fn: Optional[Callable] = field(metadata=dict(static=True), default=None)

    def mult(self, x):
        return self.mult_fn(self.ctx, x)

    def multT(self, x):
        if self.multT_fn is None:
            raise NotImplementedError("Shell operator has no multT_fn")
        return self.multT_fn(self.ctx, x)

    def diagonal(self):
        if self.diag_fn is None:
            raise NotImplementedError("Shell operator has no diag_fn")
        return self.diag_fn(self.ctx)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Transpose:
    """Implicit Aᵀ (MATTRANSPOSE)."""

    A: Any

    @property
    def shape(self):
        return (self.A.shape[1], self.A.shape[0])

    def mult(self, x):
        return self.A.multT(x)

    def multT(self, x):
        return self.A.mult(x)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Normal:
    """Implicit AᵀA (MATNORMAL, src/mat/impls/normal)."""

    A: Any

    @property
    def shape(self):
        n = self.A.shape[1]
        return (n, n)

    def mult(self, x):
        return self.A.multT(self.A.mult(x))

    multT = mult


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NormalHermitian:
    """Implicit AAᵀ."""

    A: Any

    @property
    def shape(self):
        m = self.A.shape[0]
        return (m, m)

    def mult(self, x):
        return self.A.mult(self.A.multT(x))

    multT = mult


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShiftScale:
    """alpha·A + beta·I, implicit (covers MatShift/MatScale composition)."""

    A: Any
    alpha: jax.Array
    beta: jax.Array

    @property
    def shape(self):
        return self.A.shape

    def mult(self, x):
        return self.alpha * self.A.mult(x) + self.beta * x

    def multT(self, x):
        return self.alpha * self.A.multT(x) + self.beta * x

    def diagonal(self):
        return self.alpha * self.A.diagonal() + self.beta


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Composite:
    """Sum or product of operators (MATCOMPOSITE, src/mat/impls/composite)."""

    ops: Tuple
    mode: str = field(metadata=dict(static=True), default="additive")

    @property
    def shape(self):
        if self.mode == "additive":
            return self.ops[0].shape
        return (self.ops[0].shape[0], self.ops[-1].shape[1])

    def mult(self, x):
        if self.mode == "additive":
            y = self.ops[0].mult(x)
            for op in self.ops[1:]:
                y = y + op.mult(x)
            return y
        # multiplicative: A1·A2·…·Ak x applied right-to-left
        y = x
        for op in reversed(self.ops):
            y = op.mult(y)
        return y


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LRC:
    """Low-rank correction A + U C Vᵀ, implicit (MATLRC, src/mat/impls/lrc)."""

    A: Any
    U: jax.Array  # [m, k]
    C: jax.Array  # [k, k]
    V: jax.Array  # [n, k]

    @property
    def shape(self):
        return self.A.shape

    def mult(self, x):
        return self.A.mult(x) + self.U @ (self.C @ (self.V.T @ x))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Diagonal:
    """diag(d) as an operator."""

    d: jax.Array

    @property
    def shape(self):
        n = self.d.shape[0]
        return (n, n)

    def mult(self, x):
        return self.d * x

    multT = mult

    def diagonal(self):
        return self.d


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Identity:
    """I (useful as a trivial PC / operator)."""

    shape: tuple = field(metadata=dict(static=True))

    def mult(self, x):
        return x

    multT = mult

    def apply(self, x):  # usable directly as PCNone
        return x


def csr_submatrix_keep_zeros(A, rows, cols):
    """A[rows][:, cols] PRESERVING explicitly-stored zeros.

    scipy's fancy-indexed extraction is selection-matrix matmul, which
    prunes stored zeros — but the reference's MatGetSubMatrix keeps
    them, and pattern-sensitive consumers (ILU(0)/ICC of fieldsplit/
    ASM blocks) factor on the FULL stored pattern: snes ex19's
    fieldsplit_0 ILU runs on the 576-entry DMDA-preallocated pattern,
    not the 136 true nonzeros, and the monitor digits differ by ~3%
    between the two."""
    import numpy as np
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    colmap = np.full(A.shape[1], -1, dtype=np.int64)
    colmap[cols] = np.arange(cols.size)
    out_indptr = np.zeros(rows.size + 1, dtype=np.int64)
    out_ind = []
    out_val = []
    for k, r in enumerate(rows):
        s, e = A.indptr[r], A.indptr[r + 1]
        cj = colmap[A.indices[s:e]]
        keep = cj >= 0
        cjk = cj[keep]
        vk = A.data[s:e][keep]
        order = np.argsort(cjk, kind="stable")
        out_ind.append(cjk[order])
        out_val.append(vk[order])
        out_indptr[k + 1] = out_indptr[k] + cjk.size
    ind = (np.concatenate(out_ind) if out_ind
           else np.zeros(0, np.int64))
    val = (np.concatenate(out_val) if out_val
           else np.zeros(0, A.dtype))
    return sp.csr_matrix((val, ind, out_indptr),
                         shape=(rows.size, cols.size))


def mat_zero_rows(A, rows, diag=1.0):
    """MatZeroRows_SeqAIJ (aij.c:1642) default semantics: each listed
    row is COMPRESSED to just its diagonal entry (value `diag`) —
    without MAT_KEEP_NONZERO_PATTERN the off-diagonal slots are
    removed from the pattern, which changes downstream ILU(0)/ICC
    fill. Returns a new scipy CSR."""
    import numpy as np
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    rows = np.unique(np.asarray(rows, dtype=np.int64))
    mask = np.zeros(A.shape[0], bool)
    mask[rows] = True
    row_of = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    keep = ~mask[row_of]
    lil_rows = []
    new_indptr = np.zeros(A.shape[0] + 1, np.int64)
    counts = np.bincount(row_of[keep], minlength=A.shape[0])
    counts[rows] = 1
    new_indptr[1:] = np.cumsum(counts)
    nnz = int(new_indptr[-1])
    ind = np.empty(nnz, A.indices.dtype)
    val = np.empty(nnz, A.dtype)
    # fill kept rows wholesale, BC rows with the single diagonal
    src = 0
    for r in range(A.shape[0]):
        s, e = new_indptr[r], new_indptr[r + 1]
        if mask[r]:
            ind[s] = r
            val[s] = diag
        else:
            a, b = A.indptr[r], A.indptr[r + 1]
            ind[s:e] = A.indices[a:b]
            val[s:e] = A.data[a:b]
    return sp.csr_matrix((val, ind, new_indptr), shape=A.shape)


def mat_axpy(Y, a, X, structure: str = "different"):
    """MatAXPY (src/mat/utils/axpy.c): Y ← Y + a·X as host scipy CSR.

    structure:
      "same"      — X's pattern must be a subset of Y's; values land in
                    Y's existing slots (pattern unchanged).
      "subset"    — alias of "same" (SUBSET_NONZERO_PATTERN).
      "different" — union pattern (DIFFERENT_NONZERO_PATTERN); slots
                    present in either operand are stored even when the
                    sum cancels to zero (factorization patterns see
                    the union, as in the reference).
    """
    import numpy as np
    import scipy.sparse as sp

    Y = sp.csr_matrix(Y, copy=True)
    X = sp.csr_matrix(X)
    if structure in ("same", "subset"):
        Yl = Y.tolil()
        Xc = X.tocoo()
        for r, c, v in zip(Xc.row, Xc.col, Xc.data):
            Yl[r, c] = Yl[r, c] + a * v
        out = Yl.tocsr()
        out.sort_indices()
        return out
    # union pattern with explicit zeros kept: carry indicator matrices
    ones_Y = sp.csr_matrix((np.ones_like(Y.data), Y.indices, Y.indptr),
                           shape=Y.shape)
    ones_X = sp.csr_matrix((np.ones_like(X.data), X.indices, X.indptr),
                           shape=X.shape)
    pat = (ones_Y + ones_X).tocsr()
    pat.sort_indices()
    S = Y + a * X
    S = sp.csr_matrix(S)
    S.sort_indices()
    # spread S's values onto pat's (superset) slots
    out_data = np.zeros(pat.nnz, dtype=S.dtype)
    for i in range(pat.shape[0]):
        ps, pe = pat.indptr[i], pat.indptr[i + 1]
        ss, se = S.indptr[i], S.indptr[i + 1]
        pos = np.searchsorted(pat.indices[ps:pe], S.indices[ss:se])
        out_data[ps + pos] = S.data[ss:se]
    return sp.csr_matrix((out_data, pat.indices, pat.indptr),
                         shape=Y.shape)
