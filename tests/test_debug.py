"""Debug-mode checks (checkify, operator validation, log_trace)."""

import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.core import logging as plog
from petsctpu.core.debug import checked, validate_operator, validate_system
from petsctpu.core.errors import PetscTPUError
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system


class TestChecked:
    def test_nan_raises(self):
        def bad(x):
            return jnp.log(x)          # log(-1) -> nan

        f = checked(bad)
        with pytest.raises(PetscTPUError):
            f(jnp.asarray([-1.0]))

    def test_oob_gather_raises(self):
        def bad(x, i):
            return x[i]

        f = checked(bad)
        with pytest.raises(PetscTPUError):
            f(jnp.arange(4.0), jnp.asarray(10))

    def test_clean_passes(self):
        f = checked(lambda x: 2.0 * x)
        np.testing.assert_allclose(np.asarray(f(jnp.asarray([1.0, 2.0]))),
                                   [2.0, 4.0])


class TestValidate:
    def test_good_operator(self):
        A, b, u = ex2_system(5, 5)
        validate_system(aij_from_scipy(A), jnp.asarray(b))

    def test_nan_values_caught(self):
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        bad = Ad.vals.at[0, 0].set(jnp.nan)
        from petsctpu.mat.ell import AIJ
        with pytest.raises(PetscTPUError):
            validate_operator(AIJ(Ad.cols, bad, Ad.shape, Ad.nnz))

    def test_rhs_size_mismatch(self):
        A, b, u = ex2_system(5, 5)
        with pytest.raises(PetscTPUError):
            validate_system(aij_from_scipy(A), jnp.ones(7))

    def test_matis_recursion(self):
        import scipy.sparse as sp
        from petsctpu.mat import matis_from_subdomains
        loc = sp.csr_matrix(np.eye(2))
        M = matis_from_subdomains([loc], [[0, 1]], 2)
        validate_operator(M)


class TestLogTrace:
    def test_trace_streams_events(self, capsys):
        plog.log_trace(True)
        try:
            with plog.log_event("TestEvent"):
                pass
        finally:
            plog.log_trace(False)
        out = capsys.readouterr().out
        assert "Event begin: TestEvent" in out
        assert "Event end:   TestEvent" in out
