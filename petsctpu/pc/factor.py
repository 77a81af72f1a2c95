"""Factorization preconditioners: ILU(0), LU, Cholesky/ICC.

Reference: src/ksp/pc/impls/factor/{ilu,lu,cholesky,icc}. Numeric
factorization happens host-side at setup (PCSetUp time, like the
reference); the apply is two level-scheduled SpTRSVs on device
(mat/factor.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.mat.factor import (
    BandTRSVPlan, SpTRSVPlan, ilu0, lu_factor, make_band_trsv_plan,
    make_sptrsv_plan,
)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ILUPC:
    """x = U⁻¹ L⁻¹ b with L unit-lower, U upper (pattern of A)."""

    Lplan: SpTRSVPlan
    Uplan: SpTRSVPlan

    def apply(self, b):
        return self.Uplan.solve(self.Lplan.solve(b))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PermutedPC:
    """Apply an inner PC in a symmetric permutation: M⁻¹ = Pᵀ M̃⁻¹ P
    (-pc_factor_mat_ordering_type rcm analog)."""

    inner: object
    perm: jax.Array      # new → old

    def apply(self, b):
        z = self.inner.apply(b[self.perm])
        return jnp.zeros_like(b).at[self.perm].set(z)


def make_ilu(A_host, dtype=None, levels: int = 0,
             ordering: str = "natural", tri: str = "level",
             drop_tol: float = 0.0, fill_factor: float = 10.0):
    """tri: 'level' (level-scheduled SpTRSV) or 'band' (MXU-tiled
    blocked back-substitution — far faster on TPU for banded/RCM-
    ordered factors; see mat/factor.BandTRSVPlan).

    drop_tol > 0 selects drop-tolerance ILU (ILUTP via SuperLU, the
    -pc_factor_drop_tolerance / MATSOLVERSUPERLU ILUT path of the
    reference's factor PCs): threshold-based fill instead of ILU(k)
    pattern powers."""
    if drop_tol > 0.0:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        ilu = spla.spilu(sp.csc_matrix(A_host).astype(np.float64),
                         drop_tol=drop_tol, fill_factor=fill_factor)
        L = sp.csr_matrix(ilu.L)         # unit lower with stored diag 1
        U = sp.csr_matrix(ilu.U)
        mk = (make_band_trsv_plan if tri == "band" else make_sptrsv_plan)
        inner = ILUPC(
            mk(sp.tril(L, k=-1, format="csr"), lower=True, unit_diag=True,
               dtype=dtype),
            mk(U, lower=False, unit_diag=False, dtype=dtype))
        # spilu permutes rows/cols: x = Pc U⁻¹ L⁻¹ Pr b (LUPC convention)
        return LUPC(inner.Lplan, inner.Uplan,
                    jnp.asarray(ilu.perm_r, jnp.int32),
                    jnp.asarray(ilu.perm_c, jnp.int32))
    if ordering not in ("natural", ""):
        from petsctpu.mat.order import get_ordering, permute_symmetric
        perm = get_ordering(A_host, ordering)
        inner = make_ilu(permute_symmetric(A_host, perm), dtype=dtype,
                         levels=levels, tri=tri)
        return PermutedPC(inner, jnp.asarray(perm, jnp.int32))
    return _make_ilu_natural(A_host, dtype, levels, tri)


def _make_ilu_natural(A_host, dtype=None, levels: int = 0,
                      tri: str = "level") -> ILUPC:
    if levels != 0:
        import scipy.sparse as sp
        # ILU(k) pattern growth via symbolic powers, then ILU(0) on it
        P = sp.csr_matrix(A_host, copy=True)
        P.data = np.ones_like(P.data)
        S = P
        for _ in range(levels):
            S = (S @ P).tocsr()
            S.data = np.ones_like(S.data)
        patt = (S + P).tocsr()
        patt.data[:] = 0.0
        Awide = (sp.csr_matrix(A_host) + patt).tocsr()
        L, U = ilu0(Awide)
    else:
        L, U = ilu0(A_host)
    if tri == "band2":
        from petsctpu.mat.factor import make_band_trsv_hier_plan
        return ILUPC(
            make_band_trsv_hier_plan(L, lower=True, unit_diag=True,
                                     dtype=dtype),
            make_band_trsv_hier_plan(U, lower=False, unit_diag=False,
                                     dtype=dtype))
    if tri == "band":
        return ILUPC(
            make_band_trsv_plan(L, lower=True, unit_diag=True, dtype=dtype),
            make_band_trsv_plan(U, lower=False, unit_diag=False,
                                dtype=dtype))
    return ILUPC(make_sptrsv_plan(L, lower=True, unit_diag=True, dtype=dtype),
                 make_sptrsv_plan(U, lower=False, unit_diag=False, dtype=dtype))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LUPC:
    """Exact sparse LU (SuperLU factors, device triangular solves):
    x = Pc U⁻¹ L⁻¹ Pr b."""

    Lplan: SpTRSVPlan
    Uplan: SpTRSVPlan
    perm_r: jax.Array
    perm_c: jax.Array

    def apply(self, b):
        # scipy splu convention: x = Pc U⁻¹ L⁻¹ Pr b with
        # (Pr b)[perm_r[i]] = b[i] (scatter) and (Pc z)[i] = z[perm_c[i]]
        # (gather) — matches scipy.sparse.linalg.SuperLU docs.
        pb = jnp.zeros_like(b).at[self.perm_r].set(b)
        z = self.Uplan.solve(self.Lplan.solve(pb))
        return z[self.perm_c]


def make_lu(A_host, dtype=None) -> LUPC:
    L, U, perm_r, perm_c = lu_factor(A_host)
    return LUPC(make_sptrsv_plan(L, lower=True, unit_diag=False, dtype=dtype),
                make_sptrsv_plan(U, lower=False, unit_diag=False, dtype=dtype),
                jnp.asarray(perm_r, jnp.int32), jnp.asarray(perm_c, jnp.int32))
