"""Specialty DMs: DMShell, DMRedundant, DMSliced.

Reference (SURVEY §2.8 "small specialty DMs"):
  * DMShell (src/dm/impls/shell) — user supplies the vector/matrix
    constructors and global↔local transfer callbacks; lets any user
    data layout drive KSP/SNES/TS via DMSetVecType etc.
  * DMRedundant (src/dm/impls/redundant) — N dofs stored redundantly
    on every rank (e.g. a handful of scalar parameters coupled to a
    PDE); global→local is a broadcast, local→global picks the owner.
  * DMSliced (src/dm/impls/sliced) — irregular local blocks with
    ghost entries listed explicitly (a generalized, unstructured
    DMDA; precursor of DMPlex's section layout).

These are thin, serial-semantics layouts (the sharded paths reuse
parallel/plan.py); they exist so composite multiphysics setups can
mix grid, redundant-parameter, and irregular components.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DMShell:
    """User-callback DM (DMShellCreate / DMShellSetCreateGlobalVector /
    DMShellSetGlobalToLocal analogs)."""

    n: int
    create_vec: Optional[Callable] = None
    create_mat: Optional[Callable] = None
    global_to_local: Optional[Callable] = None
    local_to_global: Optional[Callable] = None

    def create_global_vector(self, dtype=jnp.float64):
        if self.create_vec is not None:
            return self.create_vec(dtype)
        return jnp.zeros(self.n, dtype)

    def create_matrix(self, dtype=jnp.float64):
        if self.create_mat is None:
            raise ValueError("DMShell needs create_mat callback for "
                             "DMCreateMatrix")
        return self.create_mat(dtype)

    def to_local(self, x):
        return self.global_to_local(x) if self.global_to_local else x

    def to_global(self, xl):
        return self.local_to_global(xl) if self.local_to_global else xl


@dataclass(frozen=True)
class DMRedundant:
    """N redundantly-stored dofs (DMRedundantCreate). In the sharded
    setting the block is replicated; serially it is just a dense
    length-N vector with a dense matrix."""

    n: int

    def create_global_vector(self, dtype=jnp.float64):
        return jnp.zeros(self.n, dtype)

    def create_matrix(self, dtype=jnp.float64):
        from petsctpu.mat.dense import Dense
        return Dense(jnp.zeros((self.n, self.n), dtype))

    def to_local(self, x):      # broadcast: every rank sees all N
        return x

    def to_global(self, xl):
        return xl


@dataclass(frozen=True)
class DMSliced:
    """Irregular local slice: `owned` global indices plus explicit
    `ghosts` (DMSlicedCreate's ghost list). to_local gathers
    owned+ghost values; to_global scatters owned back."""

    n_global: int
    owned: np.ndarray
    ghosts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))

    @property
    def n_local(self) -> int:
        return len(self.owned) + len(self.ghosts)

    def create_global_vector(self, dtype=jnp.float64):
        return jnp.zeros(self.n_global, dtype)

    def to_local(self, x):
        idx = np.concatenate([self.owned, self.ghosts]).astype(np.int64)
        return x[jnp.asarray(idx)]

    def to_global(self, xl, x=None):
        """Scatter owned entries into the global vector (ghosts are
        never written back — the reference's INSERT_VALUES local→global
        rule for ghosted layouts)."""
        if x is None:
            x = jnp.zeros(self.n_global, xl.dtype)
        no = len(self.owned)
        return x.at[jnp.asarray(self.owned.astype(np.int64))].set(xl[:no])
