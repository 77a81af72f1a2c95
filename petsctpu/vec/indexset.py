"""IS — index sets, and local↔global mappings.

Reference: src/vec/is (impls general/stride/block;
ISLocalToGlobalMapping src/vec/is/utils/isltog.c). Index sets are
plan-time objects (host numpy); device code consumes their frozen
index arrays. They feed submatrix extraction, scatters, fieldsplit
and ASM.
"""

from __future__ import annotations

import numpy as np


class IS:
    """Base index set (general: explicit indices)."""

    def __init__(self, indices):
        self._idx = np.asarray(indices, dtype=np.int64)

    @classmethod
    def general(cls, indices) -> "IS":
        return cls(indices)

    @classmethod
    def stride(cls, n: int, first: int = 0, step: int = 1) -> "IS":
        """ISCreateStride."""
        return StrideIS(n, first, step)

    @classmethod
    def block(cls, bs: int, blocks) -> "IS":
        """ISCreateBlock: indices are block ids; expands to bs·ids+k."""
        return BlockIS(bs, blocks)

    @property
    def indices(self) -> np.ndarray:
        return self._idx

    @property
    def size(self) -> int:
        return len(self._idx)

    def sort(self) -> "IS":
        return IS(np.sort(self._idx))

    def complement(self, nmin: int, nmax: int) -> "IS":
        """ISComplement on [nmin, nmax)."""
        mask = np.ones(nmax - nmin, dtype=bool)
        mask[self._idx - nmin] = False
        return IS(np.arange(nmin, nmax)[mask])

    def union(self, other: "IS") -> "IS":
        return IS(np.union1d(self._idx, other.indices))

    def difference(self, other: "IS") -> "IS":
        return IS(np.setdiff1d(self._idx, other.indices))

    def invert_permutation(self) -> "IS":
        inv = np.empty_like(self._idx)
        inv[self._idx] = np.arange(len(self._idx))
        return IS(inv)

    def __len__(self):
        return self.size

    def __repr__(self):
        return f"IS(n={self.size}, {self._idx[:8]}...)"


class StrideIS(IS):
    def __init__(self, n, first=0, step=1):
        self.n, self.first, self.step = n, first, step
        super().__init__(first + step * np.arange(n))


class BlockIS(IS):
    def __init__(self, bs, blocks):
        self.bs = bs
        blocks = np.asarray(blocks, dtype=np.int64)
        super().__init__((blocks[:, None] * bs
                          + np.arange(bs)[None, :]).reshape(-1))


class LocalToGlobalMapping:
    """ISLocalToGlobalMapping: local index ↔ global index translation."""

    def __init__(self, global_indices):
        self.l2g = np.asarray(global_indices, dtype=np.int64)
        self._g2l = {int(g): i for i, g in enumerate(self.l2g)}

    def apply(self, local_idx) -> np.ndarray:
        return self.l2g[np.asarray(local_idx)]

    def apply_inverse(self, global_idx) -> np.ndarray:
        return np.asarray([self._g2l.get(int(g), -1)
                           for g in np.atleast_1d(global_idx)])

    @property
    def size(self):
        return len(self.l2g)
