"""VecNest and the Draw (line-graph monitor) analog."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from petsctpu.core.draw import ascii_lg, monitor_draw, save_lg_png
from petsctpu.vec.nest import VecNest


class TestVecNest:
    def setup_method(self):
        self.v = VecNest((jnp.asarray([1.0, 2.0]), jnp.asarray([3.0])))
        self.w = VecNest((jnp.asarray([0.5, 0.5]), jnp.asarray([2.0])))

    def test_sizes(self):
        assert self.v.nb == 2 and self.v.n == 3

    def test_arithmetic_blockwise(self):
        s = self.v + self.w
        np.testing.assert_allclose(np.asarray(s.sub(0)), [1.5, 2.5])
        np.testing.assert_allclose(np.asarray(s.sub(1)), [5.0])
        d = 2.0 * self.v - self.w
        np.testing.assert_allclose(np.asarray(d.sub(0)), [1.5, 3.5])

    def test_fused_reductions(self):
        assert float(self.v.dot(self.w)) == 1.0 * 0.5 + 2 * 0.5 + 3 * 2
        np.testing.assert_allclose(float(self.v.norm()),
                                   np.sqrt(1 + 4 + 9), atol=1e-14)
        assert float(self.v.norm_inf()) == 3.0

    def test_flat_roundtrip(self):
        x = self.v.flatten()
        np.testing.assert_allclose(np.asarray(x), [1, 2, 3])
        v2 = VecNest.from_flat(x, [2, 1])
        np.testing.assert_allclose(np.asarray(v2.sub(1)), [3.0])

    def test_pytree_through_jit(self):
        f = jax.jit(lambda v: (2.0 * v).norm())
        np.testing.assert_allclose(float(f(self.v)), 2 * np.sqrt(14),
                                   atol=1e-12)

    def test_with_sub(self):
        v2 = self.v.with_sub(1, jnp.asarray([9.0]))
        assert float(v2.sub(1)[0]) == 9.0
        assert float(self.v.sub(1)[0]) == 3.0      # immutable


class TestDraw:
    def _history(self):
        h = np.full(20, np.nan)
        h[:11] = 10.0 ** (-np.arange(11, dtype=float))
        return h

    def test_ascii_lg(self):
        txt = ascii_lg(self._history())
        assert "its=10" in txt and "*" in txt
        assert "1.000e-10" in txt

    def test_png_save(self, tmp_path):
        p = os.path.join(tmp_path, "lg.png")
        ok = save_lg_png(self._history(), p)
        if ok:                                    # matplotlib gated
            assert os.path.getsize(p) > 1000

    def test_monitor_draw_from_solveresult(self):
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import ex2_system
        A, b, u = ex2_system(6, 6)
        res = ksp_solve(aij_from_scipy(A), jnp.asarray(b), ksp_type="cg",
                        rtol=1e-8)
        txt = monitor_draw(res, echo=False)
        assert f"its={int(res.its)}" in txt


class TestAsciiContour:
    def test_contour_renders_peak(self):
        from petsctpu.core.draw import ascii_contour
        x = np.linspace(-2, 2, 40)
        G = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2))
        s = ascii_contour(G, width=30, height=12)
        lines = s.splitlines()
        assert len(lines) == 13
        # densest character appears mid-image (the peak), sparse at edges
        assert "@" in lines[6]
        assert "@" not in lines[0]
        assert "min=" in lines[-1]

    def test_flat_input_and_constant(self):
        from petsctpu.core.draw import ascii_contour
        s = ascii_contour(np.ones(64), width=10, height=4)
        assert "min=1" in s
