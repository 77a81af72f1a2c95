"""MatNullSpace — null-space removal for singular operators.

Reference: src/mat/interface/matnull.c (MatNullSpaceCreate/Remove/Test)
and KSP_RemoveNullSpace in itfunc.c — Krylov methods on singular but
consistent systems (e.g. pure-Neumann Poisson) stay in range(A) by
projecting the null space out of the RHS and of every preconditioned
residual.

remove() is jit-safe device code (one or two small matmuls + psum-free
dot products); construction orthonormalizes on host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NullSpace:
    """Orthonormal basis of null(A): optional constant vector plus
    explicit vectors (MatNullSpaceCreate matnull.c:107 signature)."""

    vecs: Optional[jax.Array]        # (k, n) orthonormal rows, or None
    has_constant: bool = field(metadata=dict(static=True), default=False)

    def remove(self, x):
        """x ← x − Proj_null x (MatNullSpaceRemove analog)."""
        if self.has_constant:
            x = x - jnp.mean(x)
        if self.vecs is not None:
            x = x - self.vecs.T @ (self.vecs @ x)
        return x

    def test(self, A, atol=1e-10) -> bool:
        """MatNullSpaceTest: ‖A v‖ ≈ 0 for every basis vector."""
        ok = True
        n = A.shape[0]
        if self.has_constant:
            v = jnp.ones(n, self.vecs.dtype if self.vecs is not None
                         else jnp.float64) / np.sqrt(n)
            ok &= float(jnp.linalg.norm(A.mult(v))) < atol * np.sqrt(n)
        if self.vecs is not None:
            for v in self.vecs:
                ok &= float(jnp.linalg.norm(A.mult(v))) < atol * np.sqrt(n)
        return bool(ok)


def make_nullspace(n: int, has_constant: bool = True, vecs=None,
                   dtype=None) -> NullSpace:
    """Orthonormalize user vectors (against the constant too) on host."""
    if vecs is None:
        return NullSpace(None, has_constant)
    V = np.atleast_2d(np.asarray(vecs, np.float64))
    if has_constant:
        V = V - V.mean(axis=1, keepdims=True)
    Q, R = np.linalg.qr(V.T)
    keep = np.abs(np.diag(R)) > 1e-12 * max(np.abs(np.diag(R)).max(), 1e-300)
    Q = Q[:, keep]
    return NullSpace(jnp.asarray(Q.T.astype(dtype or np.float64)),
                     has_constant)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _NullSpacePC:
    """Wraps a PC so every application is followed by null-space
    removal (the KSP_PCApply → KSP_RemoveNullSpace composition)."""

    pc: object
    nsp: NullSpace

    def apply(self, x):
        return self.nsp.remove(self.pc.apply(x))
