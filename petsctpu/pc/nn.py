"""PCNN — (balanced) Neumann-Neumann domain decomposition over MATIS.

Reference: src/ksp/pc/impls/is/nn.c (one-level Neumann-Neumann with the
balancing coarse step) and impls/bddc (BDDC, whose minimal coarse space
of subdomain constants the balancing step already realizes). Input is
the MATIS format: A = Σᵢ Rᵢᵀ Aᵢ Rᵢ with unassembled local Neumann
matrices.

Apply: M⁻¹r = Z C⁻¹ Zᵀ r  +  Σᵢ Dᵢ Rᵢᵀ Aᵢ⁺ Rᵢ Dᵢ (r − A Z C⁻¹ Zᵀ r)
with Dᵢ the partition-of-unity multiplicity weights, Aᵢ⁺ a regularized
local solve (floating Neumann subdomains are singular — pseudo-inverse
via SVD cutoff, the reference's -pc_nn_... null-space handling), and
Z the coarse basis of weighted subdomain-constant vectors whose
Galerkin matrix C = Zᵀ A Z is the balancing coarse problem.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.mat.matis import MatIS


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NNPC:
    A: MatIS                         # the unassembled operator
    weights: tuple                   # per-subdomain D_i on local dofs
    local_pinv: tuple                # per-subdomain dense A_i^+ [ni, ni]
    Z: jax.Array                     # [n, nsub] coarse basis (weighted 1s)
    Cinv: jax.Array                  # [nsub, nsub] dense inverse of Z^T A Z
    balanced: bool = field(metadata=dict(static=True), default=True)

    def _coarse(self, r):
        return self.Z @ (self.Cinv @ (self.Z.T @ r))

    def _local(self, r):
        y = jnp.zeros_like(r)
        for Wi, Pi, gi in zip(self.weights, self.local_pinv, self.A.l2g):
            ri = Wi * r[gi]
            y = y.at[gi].add(Wi * (Pi @ ri))
        return y

    def apply(self, r):
        if not self.balanced:
            return self._local(r)
        xc = self._coarse(r)
        y = xc + self._local(r - self.A.mult(xc))
        return y


def make_nn(A: MatIS, dtype=None, balanced: bool = True,
            rtol: float = 1e-10) -> NNPC:
    from petsctpu.mat.ell import aij_to_scipy

    n = A.shape[0]
    # multiplicity weights: D_i(k) = 1 / #subdomains containing node k
    mult = np.zeros(n)
    l2g_np = [np.asarray(g) for g in A.l2g]
    for g in l2g_np:
        mult[g] += 1.0
    weights = tuple(jnp.asarray(1.0 / mult[g], dtype or np.float64)
                    for g in l2g_np)
    # regularized local inverses (pinv handles floating subdomains)
    pinvs = []
    for Ai in A.locals_:
        Ad = aij_to_scipy(Ai).toarray()
        pinvs.append(jnp.asarray(np.linalg.pinv(Ad, rcond=rtol),
                                 dtype or np.float64))
    # coarse basis: weighted subdomain-constant vectors
    Z = np.zeros((n, len(l2g_np)))
    for i, g in enumerate(l2g_np):
        Z[g, i] += 1.0 / mult[g]
    Ah = A.assemble_host()
    C = Z.T @ (Ah @ Z)
    # the global constant may be in A's null space (pure Neumann):
    # regularize C the same way as the local solves
    Cinv = np.linalg.pinv(C, rcond=rtol)
    return NNPC(A, weights, tuple(pinvs),
                jnp.asarray(Z, dtype or np.float64),
                jnp.asarray(Cinv, dtype or np.float64), balanced)
