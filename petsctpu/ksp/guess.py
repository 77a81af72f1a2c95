"""KSPFischerGuess — initial guesses for sequences of related solves.

Reference: src/ksp/ksp/interface/iguess.c (KSPFischerGuessCreate
models 1 and 2, used via KSPSetUseFischerGuess; itfunc.c:371 forms
the guess before each solve and updates the model after). For a
sequence A x_k = b_k with slowly varying b_k, the guess is the
Galerkin projection of the new RHS onto the span of the last m
solutions:

  model 1: x0 = X c,  c = argmin ‖b − (A X) c‖₂  (normal equations on
           the stored pairs (x_i, A x_i); Fischer's eq. (2))
  model 2: same, with the stored pair scaled by ‖A x‖ (Fischer's
           A-norm variant for SPD A). Both models solve the small
           normal equations at form time, which subsumes the
           reference's incremental orthonormalization.

All state lives in fixed-shape device arrays (a ring buffer), so
form/update are jit-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FischerGuess:
    X: jax.Array                     # (m, n) stored solutions
    AX: jax.Array                    # (m, n) stored A·solutions
    used: jax.Array                  # scalar int: valid entries
    head: jax.Array                  # scalar int: next ring slot
    model: int = field(metadata=dict(static=True), default=1)

    @property
    def size(self) -> int:
        return self.X.shape[0]

    def form(self, b):
        """Galerkin initial guess for a new RHS (KSPFischerGuessFormGuess)."""
        m = self.size
        mask = (jnp.arange(m) < self.used).astype(b.dtype)
        G = (self.AX * mask[:, None]) @ self.AX.T * (mask[:, None] * mask)
        rhs = mask * (self.AX @ b)
        # regularized normal equations: empty slots get identity rows
        G = G + jnp.diag(1.0 - mask) + 1e-12 * jnp.eye(m, dtype=b.dtype)
        c = jnp.linalg.solve(G, rhs)
        return (mask * c) @ self.X

    def update(self, x, Ax):
        """Insert a converged solution into the ring (FischerGuessUpdate)."""
        nrm = jnp.linalg.norm(Ax if self.model == 2 else x)
        scale = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-300), 0.0)
        X = self.X.at[self.head].set(x * scale)
        AX = self.AX.at[self.head].set(Ax * scale)
        m = self.size
        return FischerGuess(X, AX,
                            jnp.minimum(self.used + 1, m),
                            (self.head + 1) % m, self.model)


def make_fischer_guess(n: int, size: int = 10, model: int = 1,
                       dtype=None) -> FischerGuess:
    dt = dtype or jnp.float64
    z = jnp.zeros((size, n), dt)
    return FischerGuess(z, z, jnp.asarray(0), jnp.asarray(0), model)
