"""Implicit-operator wrappers (matrix-free composition).

The reference has a family of wrapper Mat types — MATSHELL (user
callback), MATTRANSPOSE, MATNORMAL (AᵀA implicit), MATCOMPOSITE (ΣAᵢ or
product), MATLRC (A + U C Vᵀ) — see src/mat/impls/{shell,transpose,
normal,composite,lrc} and SURVEY.md §2.3. On TPU these are just pytree
dataclasses whose `mult` composes other operators' `mult`; XLA fuses
the arithmetic, so implicit operators are essentially free.

Any object with `.shape` and `.mult(x)` is an operator; `.multT(x)` is
optional. Solvers are generic over this protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Shell:
    """User-callback operator (MATSHELL, src/mat/impls/shell).

    `mult_fn(ctx, x)` — ctx is an arbitrary pytree of arrays.
    """

    ctx: Any
    mult_fn: Callable = field(metadata=dict(static=True))
    shape: tuple = field(metadata=dict(static=True))
    multT_fn: Optional[Callable] = field(metadata=dict(static=True), default=None)
    diag_fn: Optional[Callable] = field(metadata=dict(static=True), default=None)

    def mult(self, x):
        return self.mult_fn(self.ctx, x)

    def multT(self, x):
        if self.multT_fn is None:
            raise NotImplementedError("Shell operator has no multT_fn")
        return self.multT_fn(self.ctx, x)

    def diagonal(self):
        if self.diag_fn is None:
            raise NotImplementedError("Shell operator has no diag_fn")
        return self.diag_fn(self.ctx)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Transpose:
    """Implicit Aᵀ (MATTRANSPOSE)."""

    A: Any

    @property
    def shape(self):
        return (self.A.shape[1], self.A.shape[0])

    def mult(self, x):
        return self.A.multT(x)

    def multT(self, x):
        return self.A.mult(x)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Normal:
    """Implicit AᵀA (MATNORMAL, src/mat/impls/normal)."""

    A: Any

    @property
    def shape(self):
        n = self.A.shape[1]
        return (n, n)

    def mult(self, x):
        return self.A.multT(self.A.mult(x))

    multT = mult


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NormalHermitian:
    """Implicit AAᵀ."""

    A: Any

    @property
    def shape(self):
        m = self.A.shape[0]
        return (m, m)

    def mult(self, x):
        return self.A.mult(self.A.multT(x))

    multT = mult


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShiftScale:
    """alpha·A + beta·I, implicit (covers MatShift/MatScale composition)."""

    A: Any
    alpha: jax.Array
    beta: jax.Array

    @property
    def shape(self):
        return self.A.shape

    def mult(self, x):
        return self.alpha * self.A.mult(x) + self.beta * x

    def multT(self, x):
        return self.alpha * self.A.multT(x) + self.beta * x

    def diagonal(self):
        return self.alpha * self.A.diagonal() + self.beta


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Composite:
    """Sum or product of operators (MATCOMPOSITE, src/mat/impls/composite)."""

    ops: Tuple
    mode: str = field(metadata=dict(static=True), default="additive")

    @property
    def shape(self):
        if self.mode == "additive":
            return self.ops[0].shape
        return (self.ops[0].shape[0], self.ops[-1].shape[1])

    def mult(self, x):
        if self.mode == "additive":
            y = self.ops[0].mult(x)
            for op in self.ops[1:]:
                y = y + op.mult(x)
            return y
        # multiplicative: A1·A2·…·Ak x applied right-to-left
        y = x
        for op in reversed(self.ops):
            y = op.mult(y)
        return y


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LRC:
    """Low-rank correction A + U C Vᵀ, implicit (MATLRC, src/mat/impls/lrc)."""

    A: Any
    U: jax.Array  # [m, k]
    C: jax.Array  # [k, k]
    V: jax.Array  # [n, k]

    @property
    def shape(self):
        return self.A.shape

    def mult(self, x):
        return self.A.mult(x) + self.U @ (self.C @ (self.V.T @ x))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Diagonal:
    """diag(d) as an operator."""

    d: jax.Array

    @property
    def shape(self):
        n = self.d.shape[0]
        return (n, n)

    def mult(self, x):
        return self.d * x

    multT = mult

    def diagonal(self):
        return self.d


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Identity:
    """I (useful as a trivial PC / operator)."""

    shape: tuple = field(metadata=dict(static=True))

    def mult(self, x):
        return x

    multT = mult

    def apply(self, x):  # usable directly as PCNone
        return x
