"""Runtime matrix-format selection (-mat_type, MatSetFromOptions).

Reference: MatSetType/MatSetFromOptions + the registry in
src/mat/interface/matregis.c — `-mat_type aij|baij|sbaij|...` selects
the storage format at runtime. Device formats here:

  aij      ELL-packed general sparse (gather SpMV — robust default)
  baij     block ELL (needs -mat_block_size)
  sbaij    symmetric block upper-triangle storage
  dense    MXU dense
  dia      diagonal-offset streams (few-diagonal matrices)
  band     MXU-tiled band (RCM-ordered irregular — the TPU fast path
           for file-driven ex10-style workloads)
  sell     Pallas sliced-ELL (mat/sell.py): the fast irregular path
           when the RCM band is too wide for `band` (fp32 only;
           2.5e10 nnz/s measured vs 1.25e8 for the aij gather)
  auto     pick for the hardware: band if the RCM band is narrow,
           else sell if viable (fp32/TPU), else aij

band/dia/sell solve in the permuted space: the returned `perm` (or
None) must be applied to b and inverted on x.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def mat_from_options(A, opts=None, mat_type: str = None, dtype=None):
    """Build a device matrix per options. Returns (mat, perm|None)."""
    from petsctpu.mat import (aij_from_scipy, baij_from_scipy_bsr,
                              band_from_scipy, dia_from_scipy,
                              sbaij_from_scipy)
    from petsctpu.mat.dense import Dense
    from petsctpu.mat.order import get_ordering

    if opts is not None:
        mat_type = mat_type or opts.get_str("mat_type", "aij")
        bs = opts.get_int("mat_block_size", 1)
        ordering = opts.get_str("mat_ordering_type", "rcm")
    else:
        mat_type = mat_type or "aij"
        bs = 1
        ordering = "rcm"
    A = sp.csr_matrix(A)

    if mat_type == "aij":
        return aij_from_scipy(A, dtype=dtype), None
    if mat_type == "baij":
        return baij_from_scipy_bsr(A, bs=bs, dtype=dtype), None
    if mat_type == "sbaij":
        return sbaij_from_scipy(A, bs=bs, dtype=dtype), None
    if mat_type == "dense":
        import jax.numpy as jnp
        return Dense(jnp.asarray(A.toarray(), dtype)), None
    if mat_type in ("band", "dia"):
        perm = get_ordering(A, ordering)
        if mat_type == "band":
            return band_from_scipy(A, dtype=dtype, perm=perm), perm
        return dia_from_scipy(A, dtype=dtype, perm=perm), perm
    if mat_type == "sell":
        from petsctpu.mat.sell import sell_from_scipy
        perm = get_ordering(A, ordering)
        Ap = A[perm][:, perm].tocsr()
        Ap.sum_duplicates()
        return sell_from_scipy(Ap), perm
    if mat_type == "auto":
        return _auto_format(A, ordering, dtype)
    raise ValueError(f"unknown -mat_type {mat_type!r} "
                     "(aij|baij|sbaij|dense|band|dia|sell|auto)")


def _auto_format(A: sp.csr_matrix, ordering: str, dtype):
    """Hardware-aware default: narrow RCM band -> BandMat (751 GB/s);
    wide band but SELL-viable (fp32) -> SellMat (2.5e10 nnz/s); else
    the robust aij/ELL gather path."""
    import jax

    from petsctpu.mat import aij_from_scipy, band_from_scipy
    from petsctpu.mat.order import bandwidth, get_ordering

    perm = get_ordering(A, ordering)
    Ap = A[perm][:, perm].tocsr()
    bw = bandwidth(Ap)
    n = A.shape[0]
    f32 = np.dtype(dtype or A.dtype) == np.float32
    if bw <= max(512, n // 64):
        return band_from_scipy(A, dtype=dtype, perm=perm), perm
    if f32 and jax.default_backend() == "tpu":
        from petsctpu.mat.sell import sell_from_scipy, sell_viable
        Ap.sum_duplicates()
        if sell_viable(Ap):
            return sell_from_scipy(Ap), perm
    return aij_from_scipy(A, dtype=dtype), None
