"""Composite preconditioners: PCComposite, PCKSP, PCShell, PCMat.

Reference: src/ksp/pc/impls/composite (additive/multiplicative
combination), impls/ksp (full inner Krylov solve as a PC), PCShell,
PCMat. All are pytrees composing other PCs' `apply`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from petsctpu.ksp.common import KSPConfig


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CompositePC:
    """additive: y = Σ Mᵢ⁻¹x; multiplicative: sweep with residual
    updates (needs A)."""

    pcs: Tuple
    A: Any = None
    mode: str = field(metadata=dict(static=True), default="additive")

    def apply(self, x):
        if self.mode == "additive":
            y = self.pcs[0].apply(x)
            for p in self.pcs[1:]:
                y = y + p.apply(x)
            return y
        y = self.pcs[0].apply(x)
        for p in self.pcs[1:]:
            r = x - self.A.mult(y)
            y = y + p.apply(r)
        return y


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KSPPC:
    """Inner KSP solve as a preconditioner (PCKSP): y ≈ A⁻¹x via a full
    Krylov solve with its own (static) config and inner PC."""

    A: Any
    inner_pc: Any = None
    cfg: KSPConfig = field(metadata=dict(static=True),
                           default_factory=lambda: KSPConfig(
                               ksp_type="gmres", rtol=1e-2, maxits=20))
    axis: str = field(metadata=dict(static=True), default=None)

    def apply(self, x):
        from petsctpu.ksp.api import KSP_REGISTRY
        fn = KSP_REGISTRY[self.cfg.ksp_type]
        res = fn(self.A, x, jnp.zeros_like(x), self.inner_pc, self.cfg,
                 self.axis)
        return res.x


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShellPC:
    """User-callback PC (PCShell)."""

    ctx: Any
    apply_fn: Callable = field(metadata=dict(static=True), default=None)

    def apply(self, x):
        return self.apply_fn(self.ctx, x)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MatPC:
    """Apply a given operator as the PC (PCMat): y = M·x."""

    M: Any

    def apply(self, x):
        return self.M.mult(x)
