"""PCFieldSplit — physics-based block preconditioning.

Reference: src/ksp/pc/impls/fieldsplit/fieldsplit.c (PCApply_FieldSplit
:829; Schur path :744). Fields are index sets; the operator is split
into blocks A00/A01/A10/A11 at setup (host scipy), each with its own
sub-preconditioner configured under the `fieldsplit_<k>_` options
prefix — the reference's recursive-composition UX.

Types: additive (block diagonal), multiplicative (block Gauss-Seidel),
symmetric_multiplicative, schur (factorization diag|lower|upper|full
with S = A11 − A10·Ã00⁻¹·A01 applied matrix-free; the Schur solve is
an inner Krylov loop with an A11-based preconditioner — the
reference's `-pc_fieldsplit_schur_precondition a11` default).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.core.options import Options
from petsctpu.ksp.common import KSPConfig


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _SchurOp:
    """S v = A11 v − A10 (inner-solve A00) A01 v."""

    A00: Any
    A01: Any
    A10: Any
    A11: Any
    pc0: Any
    cfg0: KSPConfig = field(metadata=dict(static=True),
                            default_factory=lambda: KSPConfig(
                                ksp_type="preonly"))
    axis: str = field(metadata=dict(static=True), default=None)

    @property
    def shape(self):
        return self.A11.shape

    def _solve0(self, r):
        from petsctpu.ksp.api import KSP_REGISTRY
        if self.cfg0.ksp_type == "preonly":
            return self.pc0.apply(r) if self.pc0 is not None else r
        fn = KSP_REGISTRY[self.cfg0.ksp_type]
        return fn(self.A00, r, jnp.zeros_like(r), self.pc0, self.cfg0,
                  self.axis).x

    def mult(self, v):
        return self.A11.mult(v) - self.A10.mult(self._solve0(self.A01.mult(v)))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FieldSplitPC:
    isa: jax.Array                 # indices of field 0
    isb: jax.Array                 # indices of field 1 (2-field case)
    A00: Any
    A01: Any
    A10: Any
    A11: Any
    pc0: Any                       # sub-PC for A00
    pc1: Any                       # sub-PC for A11 (also Schur PC)
    n: int = field(metadata=dict(static=True))
    fs_type: str = field(metadata=dict(static=True), default="additive")
    schur_fact: str = field(metadata=dict(static=True), default="full")
    cfg0: KSPConfig = field(metadata=dict(static=True),
                            default_factory=lambda: KSPConfig(
                                ksp_type="preonly"))
    schur_cfg: KSPConfig = field(metadata=dict(static=True),
                                 default_factory=lambda: KSPConfig(
                                     ksp_type="gmres", rtol=1e-9,
                                     maxits=100))
    axis: str = field(metadata=dict(static=True), default=None)
    # optional AMAT blocks (pc->mat != pc->pmat, the KSPSetOperators
    # (A, B) case of e.g. ksp ex43): sub-solves use the pmat blocks
    # above; the multiplicative residual updates run through these
    # (fieldsplit.c jac->Afield rows are taken from pc->mat :581)
    A00a: Any = None
    A01a: Any = None
    A10a: Any = None

    # -- helpers ---------------------------------------------------------
    def _gather(self, x):
        return x[self.isa], x[self.isb]

    def _scatter(self, ya, yb):
        # ADD_VALUES like the reference's FieldSplitSplitSolveAdd /
        # SCATTER_REVERSE adds (fieldsplit.c:855,876): identical to
        # insert for disjoint splits, and required for OVERLAPPING
        # splits (runex19_8's duplicate bs-2 fields), where each
        # split's correction accumulates
        y = jnp.zeros(self.n, ya.dtype)
        return y.at[self.isa].add(ya).at[self.isb].add(yb)

    def _solve0(self, r):
        from petsctpu.ksp.api import KSP_REGISTRY
        if self.cfg0.ksp_type == "preonly":
            return self.pc0.apply(r) if self.pc0 is not None else r
        fn = KSP_REGISTRY[self.cfg0.ksp_type]
        return fn(self.A00, r, jnp.zeros_like(r), self.pc0, self.cfg0,
                  self.axis).x

    def _solve1(self, r):
        return self.pc1.apply(r) if self.pc1 is not None else r

    def _solve_schur(self, r):
        from petsctpu.ksp.api import KSP_REGISTRY
        S = _SchurOp(self.A00, self.A01, self.A10, self.A11, self.pc0,
                     self.cfg0, self.axis)
        fn = KSP_REGISTRY[self.schur_cfg.ksp_type]
        return fn(S, r, jnp.zeros_like(r), self.pc1, self.schur_cfg,
                  self.axis).x

    # -- apply -----------------------------------------------------------
    def apply(self, x):
        xa, xb = self._gather(x)
        t = self.fs_type
        if t == "additive":
            return self._scatter(self._solve0(xa), self._solve1(xb))
        if t in ("multiplicative", "symmetric_multiplicative"):
            # PCApply_FieldSplit fieldsplit.c:858-884: block Gauss-
            # Seidel where the inter-field residual runs through the
            # AMAT rows (jac->Afield) and each sub-solve ADDS into y
            A10 = self.A10a if self.A10a is not None else self.A10
            A01 = self.A01a if self.A01a is not None else self.A01
            ya = self._solve0(xa)
            # field-1 residual: xb − (A y)_1 = xb − A10·ya (y1 = 0)
            yb = self._solve1(xb - A10.mult(ya))
            if t == "symmetric_multiplicative":
                # back sweep: y0 += solve0(x0 − A00·y0 − A01·y1)
                A00 = self.A00a if self.A00a is not None else self.A00
                ya = ya + self._solve0(xa - A00.mult(ya) - A01.mult(yb))
            return self._scatter(ya, yb)
        if t == "schur":
            f = self.schur_fact
            if f == "diag":
                # reference sign convention: diag factorization uses −S
                return self._scatter(self._solve0(xa),
                                     -self._solve_schur(xb))
            if f == "lower":
                ya = self._solve0(xa)
                yb = self._solve_schur(xb - self.A10.mult(ya))
                return self._scatter(ya, yb)
            if f == "upper":
                yb = self._solve_schur(xb)
                ya = self._solve0(xa - self.A01.mult(yb))
                return self._scatter(ya, yb)
            # full
            ya_t = self._solve0(xa)
            yb = self._solve_schur(xb - self.A10.mult(ya_t))
            ya = ya_t - self._solve0(self.A01.mult(yb))
            return self._scatter(ya, yb)
        raise ValueError(f"unknown fieldsplit type {self.fs_type}")


def make_fieldsplit(A_host, fields, options: Options = None, dtype=None,
                    A_dev=None, Amat_host=None):
    """Build a 2-field FieldSplitPC from index sets (PCFieldSplitSetIS
    analog). Sub-PC types come from fieldsplit_0_pc_type /
    fieldsplit_1_pc_type (defaults: lu / jacobi-for-schur, lu else).

    A_host is the PC matrix (pc->pmat) whose diagonal blocks feed the
    sub-solves; Amat_host, when given, is the true operator (pc->mat)
    whose rows drive the multiplicative inter-field residual updates
    (fieldsplit.c:581 jac->Afield) — the KSPSetOperators(ksp, A, B)
    split of ksp ex43."""
    import scipy.sparse as sp

    from petsctpu.mat.ell import aij_from_scipy
    from petsctpu.pc.api import make_pc

    opts = options or Options()
    assert len(fields) == 2, "2-field splits supported (nest for more)"
    ia = np.asarray(fields[0].indices if hasattr(fields[0], "indices")
                    else fields[0], dtype=np.int64)
    ib = np.asarray(fields[1].indices if hasattr(fields[1], "indices")
                    else fields[1], dtype=np.int64)
    from petsctpu.mat.base import csr_submatrix_keep_zeros
    A = sp.csr_matrix(A_host)
    # MatGetSubMatrix keeps stored zeros; the inner ILU(0)/ICC patterns
    # depend on them (csr_submatrix_keep_zeros docstring)
    A00 = csr_submatrix_keep_zeros(A, ia, ia)
    A01 = csr_submatrix_keep_zeros(A, ia, ib)
    A10 = csr_submatrix_keep_zeros(A, ib, ia)
    A11 = csr_submatrix_keep_zeros(A, ib, ib)

    fs_type = opts.get_str("pc_fieldsplit_type", "additive")
    schur_fact = opts.get_str("pc_fieldsplit_schur_fact_type", "full")

    d0 = aij_from_scipy(A00, dtype=dtype)
    d1 = aij_from_scipy(A11, dtype=dtype)
    pc0_type = opts.prefixed("fieldsplit_0_").get_str("pc_type", "lu")
    pc1_default = "jacobi" if fs_type == "schur" else "lu"
    pc1_type = opts.prefixed("fieldsplit_1_").get_str("pc_type", pc1_default)
    pc0 = make_pc(pc0_type, A=d0, A_host=A00,
                  options=opts.prefixed("fieldsplit_0_"))
    pc1 = make_pc(pc1_type, A=d1, A_host=A11,
                  options=opts.prefixed("fieldsplit_1_"))

    A00a = A01a = A10a = None
    if Amat_host is not None:
        Am = sp.csr_matrix(Amat_host)
        A00a = aij_from_scipy(csr_submatrix_keep_zeros(Am, ia, ia),
                              dtype=dtype)
        A01a = aij_from_scipy(csr_submatrix_keep_zeros(Am, ia, ib),
                              dtype=dtype)
        A10a = aij_from_scipy(csr_submatrix_keep_zeros(Am, ib, ia),
                              dtype=dtype)

    return FieldSplitPC(
        isa=jnp.asarray(ia, jnp.int32), isb=jnp.asarray(ib, jnp.int32),
        A00=d0, A01=aij_from_scipy(A01, dtype=dtype),
        A10=aij_from_scipy(A10, dtype=dtype), A11=d1,
        pc0=pc0, pc1=pc1, n=A.shape[0], fs_type=fs_type,
        schur_fact=schur_fact, A00a=A00a, A01a=A01a, A10a=A10a)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MultiFieldSplitPC:
    """N-field additive / multiplicative fieldsplit
    (PCApply_FieldSplit fieldsplit.c:829 general-split loop). Each
    field f has an index set, a diagonal block operator A_ff, and a
    sub-PC; multiplicative updates the residual through the FULL
    operator between fields (the reference's block Gauss-Seidel)."""

    iss: Tuple[Any, ...]
    blocks: Tuple[Any, ...]
    pcs: Tuple[Any, ...]
    A: Any                         # full operator (multiplicative only)
    n: int = field(metadata=dict(static=True))
    fs_type: str = field(metadata=dict(static=True), default="additive")

    def _solve(self, f, r):
        pc = self.pcs[f]
        return pc.apply(r) if pc is not None else r

    def apply(self, x):
        y = jnp.zeros(self.n, x.dtype)
        if self.fs_type == "additive":
            for f, idx in enumerate(self.iss):
                y = y.at[idx].set(self._solve(f, x[idx]))
            return y
        if self.fs_type in ("multiplicative",
                            "symmetric_multiplicative"):
            order = list(range(len(self.iss)))
            if self.fs_type == "symmetric_multiplicative":
                order = order + order[-2::-1]
            for f in order:
                idx = self.iss[f]
                r = x - self.A.mult(y)
                y = y.at[idx].set(y[idx] + self._solve(f, r[idx]))
            return y
        raise ValueError(f"unknown fieldsplit type {self.fs_type}")


def make_multi_fieldsplit(A_host, fields, options: Options = None,
                          dtype=None, A_dev=None):
    """N-field FieldSplit from index sets (PCFieldSplitSetIS ×N).
    Sub-PC types come from fieldsplit_<k>_pc_type (default ilu —
    the reference's default inner preonly+ILU)."""
    import scipy.sparse as sp

    from petsctpu.mat.ell import aij_from_scipy
    from petsctpu.pc.api import make_pc

    opts = options or Options()
    A = sp.csr_matrix(A_host)
    iss, blocks, pcs = [], [], []
    for k, f in enumerate(fields):
        idx = np.asarray(f.indices if hasattr(f, "indices") else f,
                         dtype=np.int64)
        from petsctpu.mat.base import csr_submatrix_keep_zeros
        Akk = csr_submatrix_keep_zeros(A, idx, idx)
        dk = aij_from_scipy(Akk, dtype=dtype)
        ptype = opts.get_str(f"fieldsplit_{k}_pc_type", "ilu")
        pcs.append(make_pc(ptype, A=dk, A_host=Akk,
                           options=opts.prefixed(f"fieldsplit_{k}_")))
        iss.append(jnp.asarray(idx))
        blocks.append(dk)
    fs_type = opts.get_str("pc_fieldsplit_type", "additive")
    Ad = A_dev if A_dev is not None else aij_from_scipy(A, dtype=dtype)
    return MultiFieldSplitPC(tuple(iss), tuple(blocks), tuple(pcs), Ad,
                             n=A.shape[0], fs_type=fs_type)
