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

    # precision="highest": the TPU matmul default is bf16 MXU inputs,
    # which silently loses ~16 mantissa bits — solver math (residuals,
    # smoothers, Galerkin products) needs full fp32 (bf16x3 passes)
    def mult(self, x):
        return jnp.dot(self.M, x, precision="highest")

    def mult_add(self, x, y):
        return y + self.mult(x)

    def multT(self, x):
        return jnp.dot(self.M.T, x, precision="highest")

    def diagonal(self):
        return jnp.diagonal(self.M)

    def mult_dense(self, X):
        return jnp.dot(self.M, X, precision="highest")
