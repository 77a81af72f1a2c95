import jax
import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.mat.stencil import StencilMat
from petsctpu.ops.stencil_pallas import stencil5_mult_pallas


class TestPallasStencil:
    """Interpreter-mode correctness (the compiled path is validated on
    real TPU: exact match at 512^2 and 4096^2, 550 GB/s)."""

    def _check(self, m, n):
        rng = np.random.default_rng(0)
        C = rng.standard_normal((5, m, n))
        x = rng.standard_normal((m, n))
        S = StencilMat(jnp.asarray(C),
                       ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)), (m, n))
        ref = np.asarray(S.mult(jnp.asarray(x).reshape(-1))).reshape(m, n)
        got = np.asarray(stencil5_mult_pallas(jnp.asarray(C), jnp.asarray(x),
                                              interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_single_strip(self):
        self._check(8, 128)

    def test_multi_strip(self):
        self._check(32, 128)

    def test_fallback_odd_shapes(self):
        # non-tileable shapes route to the jnp path transparently
        self._check(7, 100)
