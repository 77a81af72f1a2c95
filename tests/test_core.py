import numpy as np
import pytest

from petsctpu.core.options import Options
from petsctpu.core.layout import Layout


class TestOptions:
    def test_basic_get_set(self):
        o = Options({"ksp_type": "gmres", "ksp_rtol": "1e-6"})
        assert o.get_str("ksp_type") == "gmres"
        assert o.get_real("ksp_rtol") == 1e-6
        assert o.get_int("ksp_max_it", 10000) == 10000

    def test_from_args(self):
        o = Options.from_args(["-ksp_type", "cg", "-ksp_monitor", "-m", "5"])
        assert o.get_str("ksp_type") == "cg"
        assert o.get_bool("ksp_monitor") is True
        assert o.get_int("m") == 5

    def test_prefix_composition(self):
        o = Options({"mg_levels_ksp_type": "chebyshev", "pc_type": "mg"})
        sub = o.prefixed("mg_levels_")
        assert sub.get_str("ksp_type") == "chebyshev"
        subsub = o.prefixed("mg_").prefixed("levels_")
        assert subsub.get_str("ksp_type") == "chebyshev"

    def test_unused_tracking(self):
        o = Options({"ksp_type": "cg", "typo_option": 1})
        o.get_str("ksp_type")
        assert o.unused() == ["typo_option"]

    def test_bool_parsing(self):
        o = Options({"a": "true", "b": "0", "c": None, "d": False})
        assert o.get_bool("a") and o.get_bool("c")
        assert not o.get_bool("b") and not o.get_bool("d")


class TestLayout:
    def test_even(self):
        L = Layout(16, 4)
        assert L.shard_size == 4 and L.n_pad == 0
        assert L.range(1) == (4, 8)
        np.testing.assert_array_equal(L.owner([0, 5, 15]), [0, 1, 3])

    def test_padded(self):
        L = Layout(10, 4)
        assert L.shard_size == 3 and L.n_padded == 12 and L.n_pad == 2
        x = np.arange(10.0)
        xp = L.pad_vector(x)
        assert xp.shape == (12,) and xp[-1] == 0
        np.testing.assert_array_equal(L.unpad_vector(xp), x)


class TestHelpSelfDocumentation:
    """-help analog: options are documented at consumption time
    (aoptions.c self-documenting blocks)."""

    def test_help_records_queried_options(self):
        from petsctpu.core.options import Options
        o = Options({"ksp_rtol": 1e-7})
        o.get_real("ksp_rtol", 1e-5)
        o.get_int("ksp_max_it", 10000)
        o.prefixed("mg_levels_").get_str("ksp_type", "chebyshev")
        txt = o.help_text()
        assert "-ksp_rtol" in txt and "default=1e-05" in txt
        assert "current=1e-07" in txt or "current=1e-07" in txt.replace("'", "")
        assert "-ksp_max_it" in txt
        assert "-mg_levels_ksp_type" in txt and "<str>" in txt

    def test_ksp_help_flag(self, capsys):
        import jax.numpy as jnp
        from petsctpu.core.options import Options
        from petsctpu.ksp import KSP
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models import ex2_system
        A, b, u = ex2_system(5, 5)
        ksp = KSP(Options({"ksp_type": "cg", "pc_type": "jacobi",
                           "help": None}))
        ksp.set_operators(aij_from_scipy(A), A)
        ksp.solve(jnp.asarray(b))
        out = capsys.readouterr().out
        assert "Options consumed" in out
        assert "-ksp_rtol" in out and "-pc_type" in out
