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
        if opts.get_bool("info", False):
            from petsctpu.core.logging import info_on
            info_on()
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
        M, perm = _auto_format(A, ordering, dtype)
        from petsctpu.core.logging import petsc_info
        petsc_info("MatFromOptions",
                   f"-mat_type auto: n={A.shape[0]} nnz={A.nnz} -> "
                   f"{type(M).__name__}"
                   + ("" if perm is None else " (permuted)"))
        return M, perm
    raise ValueError(f"unknown -mat_type {mat_type!r} "
                     "(aij|baij|sbaij|dense|band|dia|sell|auto)")


def _auto_format(A: sp.csr_matrix, ordering: str, dtype):
    """Hardware-aware default: narrow band -> BandMat (751 GB/s);
    wide band but SELL-viable (fp32) -> SellMat (2.5e10 nnz/s); else
    the robust aij/ELL gather path.

    Ordering policy (the reference's default kernel is its fast
    kernel, aij.c:1173, and its Inode/CRL detection upgrades the
    layout silently): the NATURAL ordering is tried first — when the
    matrix is already banded or SELL-viable as given, no permutation
    is applied at all (parity-safe: values, ordering, and iteration
    counts are untouched). Only when natural fails does the plan
    evaluate permutations, choosing by the SELL plan's own pass-count
    cost model (per-row q-chunk dispersion — see mat/sell.py)."""
    import jax

    from petsctpu.mat import aij_from_scipy, band_from_scipy
    from petsctpu.mat.order import bandwidth, get_ordering

    n = A.shape[0]
    band_thresh = max(512, n // 64)
    f32 = np.dtype(dtype or A.dtype) == np.float32
    tpu = jax.default_backend() == "tpu"

    # 1) natural band (identity perm — fastest AND parity-exact)
    if bandwidth(A) <= band_thresh:
        return band_from_scipy(A, dtype=dtype), None

    # 2) natural SELL — near-ideal slop short-circuits with NO perm
    from petsctpu.mat.sell import (sell_from_scipy, sell_plan_stats,
                                   sell_viable)
    avg = A.nnz / max(n, 1)
    An = A.copy()
    An.sum_duplicates()
    best = None                     # (P, perm|None, matrix)
    if f32 and tpu and sell_viable(An):
        Pn = sell_plan_stats(An)[0]
        if Pn <= 2.0 * avg:
            return sell_from_scipy(An), None
        best = (Pn, None, An)

    # 3) structured-grid recovery FIRST (mat/griddetect): when it
    #    succeeds the stencil's pass count collapses to ~avg_row and
    #    beats any profile ordering, so the RCM candidate evaluation
    #    below is skipped entirely (it was ~half the 64³ plan time)
    grid_won = False
    if best is None or best[0] > 2.0 * avg:
        from petsctpu.mat.griddetect import grid_recover_ordering
        gperm, gdims = grid_recover_ordering(A, return_dims=True)
        if gperm is not None:
            # a recovered grid is a <= 3^d-offset stencil with ~zero
            # band fill: build stencil coefficient STREAMS directly
            # (mat/stencil.py — no index arrays at all; 622 -> 706
            # GB/s over the recovered-SELL route on the 64^3 27-point
            # probe, same kernel the 16.7M-row roofline bench rides)
            Ag = A[gperm][:, gperm].tocsr()
            Ag.sum_duplicates()
            cog = Ag.tocoo()
            rcs = np.unravel_index(cog.row, gdims)
            ccs = np.unravel_index(cog.col, gdims)
            # stencil offsets are in {-1,0,1}^d (verified by the
            # recovery) — encode each as one base-3 int so the
            # dedup is a plain integer unique, not a 6.8M-row
            # lexsort (np.unique axis=0 cost ~15 s on the 64^3 probe)
            key = np.zeros(cog.row.shape, np.int64)
            for rk, ck in zip(rcs, ccs):
                key = key * 3 + (ck.astype(np.int64) - rk + 1)
            okeys, oinv = np.unique(key, return_inverse=True)
            K = len(okeys)
            if K * n <= 2.0 * max(Ag.nnz, 1):   # boundary-pad guard
                import jax.numpy as jnp

                from petsctpu.mat.stencil import StencilMat
                offs = []
                for ok in okeys:
                    o, ds = [], int(ok)
                    for _ in gdims:
                        o.append(ds % 3 - 1)
                        ds //= 3
                    offs.append(tuple(reversed(o)))
                C = np.zeros((K,) + tuple(gdims),
                             np.dtype(dtype or A.dtype))
                C[(oinv,) + rcs] = cog.data
                return (StencilMat(jnp.asarray(C), tuple(offs),
                                   tuple(gdims)), gperm)
            if f32 and tpu and n < 2_000_000 and sell_viable(Ag):
                Pg = sell_plan_stats(Ag)[0]
                if best is None or Pg < best[0]:
                    best = (Pg, gperm, Ag)
                    grid_won = True
            elif bandwidth(Ag) <= band_thresh:
                return (band_from_scipy(A, dtype=dtype, perm=gperm),
                        gperm)

    # 4) profile (RCM) candidates — only when grid recovery didn't
    #    already win (a recovered stencil's pass count collapses to
    #    ~avg_row, unbeatable by any band profile). The candidate
    #    RANKING only needs an RCM-shaped profile, not SPARSPAK-exact
    #    tie-breaks (-pc_factor_mat_ordering_type parity keeps
    #    genrcm): scipy's RCM is ~20x faster at 262k rows.
    if not grid_won:
        perm = get_ordering(A, "rcm_fast" if ordering == "rcm"
                            else ordering)
        Ap = A[perm][:, perm].tocsr()
        if bandwidth(Ap) <= band_thresh:
            return band_from_scipy(A, dtype=dtype, perm=perm), perm
        if f32 and tpu:
            Ap.sum_duplicates()
            if sell_viable(Ap):
                Pp = sell_plan_stats(Ap)[0]
                if best is None or Pp < best[0]:
                    best = (Pp, perm, Ap)
    if best is not None:
        return sell_from_scipy(best[2]), best[1]
    return aij_from_scipy(A, dtype=dtype), None
