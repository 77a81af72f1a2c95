"""PetscRandom analog over jax.random.

Reference: src/sys/classes/random (PetscRandomCreate/SetInterval/
GetValue). Deterministic, splittable, device-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Random:
    def __init__(self, seed: int = 0x12345678, lo=0.0, hi=1.0):
        self._key = jax.random.PRNGKey(seed)
        self.lo, self.hi = lo, hi

    def set_interval(self, lo, hi) -> "Random":
        self.lo, self.hi = lo, hi
        return self

    def _split(self):
        self._key, k = jax.random.split(self._key)
        return k

    def get_values(self, shape, dtype=jnp.float64):
        u = jax.random.uniform(self._split(), shape, dtype=jnp.float32)
        return (self.lo + (self.hi - self.lo) * u).astype(dtype)

    def get_value(self, dtype=jnp.float64):
        return self.get_values((), dtype)

    def get_normal(self, shape, dtype=jnp.float64):
        return jax.random.normal(self._split(), shape).astype(dtype)


class Rand48:
    """Bit-exact PETSCRAND48 analog (src/sys/classes/random/impls/
    rand48: srand48/drand48 with PETSc's default seed 0x12345678 set
    at PetscRandomSetType, randomc.c:376 + randreg.c:50). Used to
    reproduce VecSetRandom-driven reference goldens (e.g. snes ex35's
    random RHS) exactly: drand48 is the POSIX 48-bit LCG
    X' = (0x5DEECE66D·X + 0xB) mod 2^48, seeded X = (seed<<16)|0x330E."""

    def __init__(self, seed: int = 0x12345678, lo=0.0, hi=1.0):
        self._x = ((seed & 0xFFFFFFFF) << 16) | 0x330E
        self.lo, self.hi = lo, hi

    def get_value(self) -> float:
        self._x = (0x5DEECE66D * self._x + 0xB) & ((1 << 48) - 1)
        u = self._x / float(1 << 48)
        return self.lo + (self.hi - self.lo) * u

    def get_values(self, n: int):
        import numpy as np
        return np.array([self.get_value() for _ in range(n)])
