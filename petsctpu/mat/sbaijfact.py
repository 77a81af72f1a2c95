"""SBAIJ blocked Cholesky / IC(k) — symmetric block factorization.

Reference: src/mat/impls/sbaij/seq/sbaijfact.c (1,596 LoC:
MatCholeskyFactorNumeric_SeqSBAIJ_N and the bs-specialized variants):
A ≈ UᵀDU over the BLOCK upper triangle, with bs×bs block pivots D_k —
the blocked path pc/factor's scalar ICC (aijfact.c route) cannot
reproduce (block pivots couple the bs dofs of a node; the scalar
factorization loses that coupling in its incomplete variants).

Plan-time recurrence (block rows, incomplete-pattern restricted):
    D_k  = A_kk − Σ_{i<k, k∈pat(i)} U_ikᵀ D_i U_ik
    U_kj = D_k⁻¹ (A_kj − Σ_{i<k, k,j∈pat(i)} U_ikᵀ D_i U_ij)
Symbolic pattern = scalar IC(k) on the BLOCK graph (mat/factor
icc_pattern — the Saad level rule the reference uses at block
granularity, sbaijfact.c symbolic phase).

Device solve: the block factor is expanded to a SCALAR unit-upper
UᵀDU by factoring each block pivot D_k = u_kᵀ d_k u_k (dense UDU) and
forming W = blockdiag(u_k)·U — scalar unit-upper with d scalar
diagonal — so the existing level-scheduled SpTRSV plans (pc/factor
ICCPC) run it unchanged on device.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _dense_udu(Ab: np.ndarray):
    """A = uᵀ d u with u unit upper, d diagonal (bs×bs dense)."""
    bs = Ab.shape[0]
    u = np.eye(bs)
    d = np.zeros(bs)
    C = Ab.astype(np.float64).copy()
    for p in range(bs):
        d[p] = C[p, p]
        if d[p] == 0.0:
            raise ZeroDivisionError(f"zero scalar pivot in block (dof {p})")
        u[p, p + 1:] = C[p, p + 1:] / d[p]
        C[p + 1:, p + 1:] -= np.outer(u[p, p + 1:], C[p, p + 1:])
    return u, d


def sbaij_cholesky_factor(A_host, bs: int, levels=None,
                          shift: float = 0.0):
    """Blocked UᵀDU factorization of a symmetric matrix in bs-blocks.

    levels: IC(k) level count on the block graph; None = FULL fill
    (exact blocked Cholesky). Returns (Wstrict, d) — the scalar
    unit-upper expansion: A ≈ (I+Wstrict)ᵀ diag(d) (I+Wstrict).
    """
    from petsctpu.mat.factor import icc_pattern

    A = sp.csr_matrix(A_host).astype(np.float64)
    n = A.shape[0]
    assert n % bs == 0, (n, bs)
    nb = n // bs
    Ab = A.tobsr(blocksize=(bs, bs))
    # block-graph (upper) pattern
    G = sp.csr_matrix((np.ones(len(Ab.indices)),
                       Ab.indices, Ab.indptr), shape=(nb, nb))
    G = ((G + G.T) != 0).astype(np.float64).tocsr()
    lev = nb if levels is None else levels
    pat_rows = icc_pattern(G, lev)   # per-row strict-upper col arrays
    # dense block lookup of A (upper incl. diagonal)
    Ablk = {}
    for k in range(nb):
        for t in range(Ab.indptr[k], Ab.indptr[k + 1]):
            j = int(Ab.indices[t])
            if j >= k:
                Ablk[(k, j)] = Ab.data[t]

    # native C++ numeric kernel (sbaij_block_udu) when available —
    # same recurrence, bit-compatible with the Python loop below
    from petsctpu import native as _native
    pat_indptr = np.zeros(nb + 1, np.int64)
    pat_indptr[1:] = np.cumsum([len(r) for r in pat_rows])
    pat_cols = (np.concatenate(pat_rows) if pat_indptr[-1]
                else np.zeros(0, np.int64))
    # upper-including-diagonal block CSR of A
    mask_up = np.repeat(np.arange(nb), np.diff(Ab.indptr)) <= Ab.indices
    native_res = None
    if _native.available():
        au_i = np.zeros(nb + 1, np.int64)
        rows_of = np.repeat(np.arange(nb), np.diff(Ab.indptr))
        au_rows = rows_of[mask_up]
        au_cols = Ab.indices[mask_up].astype(np.int64)
        au_vals = Ab.data[mask_up]
        np.add.at(au_i, au_rows + 1, 1)
        np.cumsum(au_i, out=au_i)
        native_res = _native.sbaij_block_udu(au_i, au_cols, au_vals,
                                             pat_indptr, pat_cols, bs,
                                             shift)
    if native_res is not None:
        uv, dv = native_res
        U = [dict() for _ in range(nb)]
        D = [dv[k] for k in range(nb)]
        for k in range(nb):
            for t in range(pat_indptr[k], pat_indptr[k + 1]):
                U[k][int(pat_cols[t])] = uv[t]
        return _expand_scalar(U, D, nb, bs, pat_rows)

    U = [None] * nb                           # per row: {j: block}
    D = [None] * nb
    colbucket = [[] for _ in range(nb)]       # k -> list of rows i<k
    I = np.eye(bs)
    for k in range(nb):
        cols_k = pat_rows[k]
        acc = {k: Ablk.get((k, k), np.zeros((bs, bs))).copy()
               + shift * I}
        for j in cols_k:
            acc[int(j)] = Ablk.get((k, int(j)),
                                   np.zeros((bs, bs))).copy()
        for i in colbucket[k]:
            Uik = U[i][k]
            M = Uik.T @ D[i]
            for j, Uij in U[i].items():
                if j >= k and j in acc:     # includes j == k (the
                    acc[j] -= M @ Uij       # D_k correction term)
        D[k] = acc[k]
        Dinv = np.linalg.inv(D[k])
        U[k] = {}
        for j in cols_k:
            U[k][int(j)] = Dinv @ acc[int(j)]
        for j in cols_k:
            colbucket[int(j)].append(k)

    return _expand_scalar(U, D, nb, bs, pat_rows)


def _expand_scalar(U, D, nb: int, bs: int, pat_rows):
    """Scalar expansion: W = blockdiag(u_k) (I + U_strict) − I with
    D_k = u_kᵀ d_k u_k, so A ≈ (I+W)ᵀ diag(d) (I+W)."""
    n = nb * bs
    rows, cols, vals = [], [], []
    d_scalar = np.zeros(n)
    for k in range(nb):
        u_k, d_k = _dense_udu(D[k])
        d_scalar[k * bs:(k + 1) * bs] = d_k
        us = u_k - np.eye(bs)                 # strict part of u_k
        for a in range(bs):
            for b in range(a + 1, bs):
                if us[a, b] != 0.0:
                    rows.append(k * bs + a)
                    cols.append(k * bs + b)
                    vals.append(us[a, b])
        for j, Ukj in U[k].items():
            W = u_k @ Ukj
            for a in range(bs):
                for b in range(bs):
                    if W[a, b] != 0.0:
                        rows.append(k * bs + a)
                        cols.append(j * bs + b)
                        vals.append(W[a, b])
    Wstrict = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    return Wstrict, d_scalar


def make_sbaij_cholesky(A_host, bs: int, levels=None, dtype=None,
                        shift: float = 0.0, tri: str = "level"):
    """PC factory: blocked Cholesky (levels=None) / blocked IC(k) on
    SBAIJ-style block structure, applied with the scalar ICCPC device
    solves (x = U⁻¹ D⁻¹ U⁻ᵀ b)."""
    import jax.numpy as jnp

    from petsctpu.pc.factor import (ICCPC, make_band_trsv_plan,
                                    make_sptrsv_plan)

    Wstrict, d = sbaij_cholesky_factor(A_host, bs, levels=levels,
                                       shift=shift)
    L = sp.csr_matrix(Wstrict.T)
    mk = (make_band_trsv_plan if tri == "band" else make_sptrsv_plan)
    dt = dtype or np.float64
    return ICCPC(mk(L, lower=True, unit_diag=True, dtype=dtype),
                 mk(Wstrict, lower=False, unit_diag=True, dtype=dtype),
                 jnp.asarray(1.0 / d, dt))
