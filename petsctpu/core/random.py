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
