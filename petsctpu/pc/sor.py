"""SOR/SSOR preconditioner.

Reference: PCSOR (src/ksp/pc/impls/sor) delegating to MatSOR
(src/mat/impls/aij/seq/aij.c:1463). A Gauss-Seidel sweep is a
triangular solve in disguise:
    x ← (D/ω + L)⁻¹ (b − U x + ((1−ω)/ω) D x)
so on TPU each sweep is one level-scheduled SpTRSV (mat/factor.py)
plus an ELL SpMV — the sequential row loop becomes a wavefront loop.
Supports forward / backward / symmetric sweeps and ω ≠ 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.mat.ell import AIJ, aij_from_scipy
from petsctpu.mat.factor import SpTRSVPlan, make_sptrsv_plan


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SORPC:
    fwd_plan: SpTRSVPlan          # (D/ω + L)⁻¹
    bwd_plan: SpTRSVPlan          # (D/ω + U)⁻¹
    U_ell: AIJ                    # strict upper
    L_ell: AIJ                    # strict lower
    diag: jax.Array
    omega: float = field(metadata=dict(static=True), default=1.0)
    sweeps: int = field(metadata=dict(static=True), default=1)
    symmetric: bool = field(metadata=dict(static=True), default=True)
    forward_only: bool = field(metadata=dict(static=True), default=False)

    def apply(self, b):
        w = self.omega
        x = jnp.zeros_like(b)
        gd = ((1.0 - w) / w) * self.diag
        for _ in range(self.sweeps):
            # forward sweep
            rhs = b - self.U_ell.mult(x) + gd * x
            x = self.fwd_plan.solve(rhs)
            if self.symmetric:
                rhs = b - self.L_ell.mult(x) + gd * x
                x = self.bwd_plan.solve(rhs)
        return x


def make_sor(A_host, omega: float = 1.0, sweeps: int = 1,
             symmetric: bool = True, dtype=None) -> SORPC:
    A = sp.csr_matrix(A_host)
    L = sp.tril(A, k=-1, format="csr")
    U = sp.triu(A, k=1, format="csr")
    d = A.diagonal()
    Dw = sp.diags(d / omega)
    fwd = make_sptrsv_plan((Dw + L).tocsr(), lower=True, unit_diag=False,
                           dtype=dtype)
    bwd = make_sptrsv_plan((Dw + U).tocsr(), lower=False, unit_diag=False,
                           dtype=dtype)
    return SORPC(fwd, bwd, aij_from_scipy(U, dtype=dtype),
                 aij_from_scipy(L, dtype=dtype),
                 jnp.asarray(d.astype(dtype or d.dtype)), float(omega),
                 int(sweeps), bool(symmetric))
