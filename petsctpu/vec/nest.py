"""VecNest — a vector of sub-vectors (block systems).

Reference: src/vec/vec/impls/nest (VecCreateNest, VecNestGetSubVec;
the vector-side partner of MATNEST for block/multiphysics systems).
Device representation: a tuple of jax arrays treated as one logical
vector; all Vec ops work blockwise and reductions fuse across blocks.
VecNest is itself a pytree, so it flows through jit/while_loop like a
flat vector — `flatten`/`from_flat` bridge to the monolithic layout
(DMComposite's packing) when a flat solver is preferred.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class VecNest:
    blocks: tuple

    @property
    def nb(self):
        return len(self.blocks)

    @property
    def n(self):
        return sum(int(b.shape[0]) for b in self.blocks)

    @property
    def dtype(self):
        return self.blocks[0].dtype

    # ---- blockwise arithmetic (VecAXPY/VecScale/... on nests) ----
    def __add__(self, other):
        return VecNest(tuple(a + b for a, b in zip(self.blocks,
                                                   other.blocks)))

    def __sub__(self, other):
        return VecNest(tuple(a - b for a, b in zip(self.blocks,
                                                   other.blocks)))

    def __mul__(self, s):
        return VecNest(tuple(s * a for a in self.blocks))

    __rmul__ = __mul__

    def axpy(self, alpha, x: "VecNest") -> "VecNest":
        return VecNest(tuple(a + alpha * b
                             for a, b in zip(self.blocks, x.blocks)))

    # ---- fused reductions across blocks (one pass) ----
    def dot(self, other: "VecNest"):
        return sum(jnp.vdot(a, b)
                   for a, b in zip(self.blocks, other.blocks))

    def norm(self):
        return jnp.sqrt(sum(jnp.vdot(a, a).real for a in self.blocks))

    def norm_inf(self):
        return jnp.max(jnp.stack([jnp.max(jnp.abs(a))
                                  for a in self.blocks]))

    # ---- sub-vector access (VecNestGetSubVec) ----
    def sub(self, i: int):
        return self.blocks[i]

    def with_sub(self, i: int, v) -> "VecNest":
        bl = list(self.blocks)
        bl[i] = v
        return VecNest(tuple(bl))

    # ---- flat interop ----
    def flatten(self):
        return jnp.concatenate([jnp.ravel(b) for b in self.blocks])

    @classmethod
    def from_flat(cls, x, sizes) -> "VecNest":
        off = np.cumsum([0] + list(sizes))
        return cls(tuple(x[off[i]:off[i + 1]] for i in range(len(sizes))))

    @classmethod
    def zeros_like(cls, other: "VecNest") -> "VecNest":
        return cls(tuple(jnp.zeros_like(b) for b in other.blocks))
