"""Pointwise preconditioners: none, Jacobi, point-block Jacobi.

Reference: src/ksp/pc/impls/{none,jacobi,pbjacobi}. Jacobi supports the
reference's rowmax/rowsum variants; PBJacobi inverts the dense bs×bs
diagonal blocks at setup (a batched inverse on device).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NonePC:
    def apply(self, x):
        return x


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class JacobiPC:
    dinv: jax.Array

    def apply(self, x):
        return self.dinv * x


def make_jacobi(A, variant: str = "diag", A_host=None) -> JacobiPC:
    """variant: diag | rowmax | rowsum (jacobi.c options)."""
    if variant == "diag":
        d = A.diagonal()
    elif variant == "rowmax":
        d = jnp.max(jnp.abs(A.vals), axis=1)
    elif variant == "rowsum":
        d = A.rows_sum()
    else:
        raise ValueError(f"unknown jacobi variant {variant}")
    # zero diagonal → identity on that row (same guard as jacobi.c)
    dinv = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 1.0)
    return JacobiPC(dinv)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PBJacobiPC:
    """Point-block Jacobi: x ← blockdiag(A)⁻¹ x, blocks bs×bs."""

    binv: jax.Array            # [nb, bs, bs]
    bs: int = field(metadata=dict(static=True), default=1)

    def apply(self, x):
        xb = x.reshape(-1, self.bs)
        return jnp.einsum("bij,bj->bi", self.binv, xb).reshape(-1)


def make_pbjacobi(A, bs: int = None) -> PBJacobiPC:
    if hasattr(A, "diag_blocks"):          # BAIJ
        blocks = A.diag_blocks()
        bs = A.bs
    else:
        if not bs:
            raise ValueError("pbjacobi on AIJ needs explicit bs")
        n = A.shape[0]
        rows = jnp.arange(n)
        # extract dense bs×bs diagonal blocks from ELL layout
        brow = rows // bs
        lo = (brow * bs)[:, None]
        in_block = (A.cols >= lo) & (A.cols < lo + bs)
        nb = n // bs
        blocks = jnp.zeros((nb, bs, bs), A.vals.dtype)
        flat_b = (rows[:, None] // bs) * (bs * bs) \
            + (rows[:, None] % bs) * bs + (A.cols - lo)
        flat_b = jnp.where(in_block, flat_b, nb * bs * bs)
        blocks = jnp.zeros(nb * bs * bs + 1, A.vals.dtype).at[
            flat_b.ravel()].add(jnp.where(in_block, A.vals, 0).ravel())[:-1]
        blocks = blocks.reshape(nb, bs, bs)
    return PBJacobiPC(jnp.linalg.inv(blocks), int(bs))
