"""Dense matrix operator (SeqDense analog, src/mat/impls/dense).

On TPU a dense mult is a single MXU matmul; factorizations use
jax.scipy/lax.linalg (LU/Cholesky), replacing the reference's
LAPACK dependency.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Dense:
    M: jax.Array

    @property
    def shape(self):
        return self.M.shape

    @property
    def dtype(self):
        return self.M.dtype

    def mult(self, x):
        return self.M @ x

    def mult_add(self, x, y):
        return y + self.M @ x

    def multT(self, x):
        return self.M.T @ x

    def diagonal(self):
        return jnp.diagonal(self.M)

    def mult_dense(self, X):
        return self.M @ X
