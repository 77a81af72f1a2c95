"""DMComposite — packing multiple DMs / field spaces into one system.

Reference: src/dm/impls/composite (DMCompositeAddDM, DMCompositeScatter,
DMCompositeGetGlobalISs — multiphysics packing of heterogeneous
sub-problems into one global vector/matrix). Here a composite is a
tuple of components, each either a DA or a plain size; packing is
concatenation (contiguous blocks, the reference's serial layout), and
the global ISs feed PCFieldSplit exactly like
DMCompositeGetGlobalISs → PCFieldSplitSetIS.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from petsctpu.vec.indexset import IS


@dataclass(frozen=True)
class DMComposite:
    """Composite of sub-spaces; each entry is a DA or an int size."""

    components: tuple

    @classmethod
    def create(cls, *components) -> "DMComposite":
        return cls(tuple(components))

    @property
    def sizes(self) -> tuple:
        out = []
        for c in self.components:
            out.append(c if isinstance(c, int) else int(np.prod(c.grid)))
        return tuple(out)

    @property
    def n(self) -> int:
        return sum(self.sizes)

    def offsets(self) -> tuple:
        off = [0]
        for s in self.sizes:
            off.append(off[-1] + s)
        return tuple(off)

    def create_global_vector(self, dtype=jnp.float64):
        return jnp.zeros(self.n, dtype)

    def global_iss(self) -> Sequence[IS]:
        """DMCompositeGetGlobalISs: one IS per component (drives
        fieldsplit)."""
        off = self.offsets()
        return [IS.stride(self.sizes[i], first=off[i], step=1)
                for i in range(len(self.components))]

    def split(self, x):
        """DMCompositeScatter analog: global vector → per-component."""
        off = self.offsets()
        return [x[off[i]:off[i + 1]] for i in range(len(self.components))]

    def pack(self, *parts):
        """DMCompositeGather analog: per-component vectors → global."""
        assert len(parts) == len(self.components)
        return jnp.concatenate([jnp.ravel(p) for p in parts])

    def split_grids(self, x):
        """split + reshape DA components onto their grids."""
        out = []
        for c, p in zip(self.components, self.split(x)):
            out.append(p if isinstance(c, int) else p.reshape(c.grid))
        return out
