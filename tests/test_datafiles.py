"""Workload regression on the reference's OWN shipped data files.

Reference: the ex10 DATAFILESPATH suite (SURVEY.md §4 — "Reads a PETSc
matrix and vector from a file and solves a linear system",
src/ksp/ksp/examples/tutorials/ex10.c) driven over
share/petsc/datafiles/matrices. These tests read the actual reference
binaries with our reader and solve them across formats and solvers —
real interop, not synthetic round-trips.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from petsctpu.io import petsc_binary_read_mat
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.pc import make_pc

DATA = "/root/reference/share/petsc/datafiles/matrices"

needs_data = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference datafiles not mounted")


@needs_data
class TestReferenceDatafiles:
    def _load(self, name):
        return petsc_binary_read_mat(os.path.join(DATA, name))

    def test_read_spd(self):
        A = self._load("spd-real-int32-float64")
        assert A.shape == (12, 12) and A.nnz == 46
        assert abs(A - A.T).max() == 0.0          # SPD file is symmetric

    def test_read_ns(self):
        A = self._load("ns-real-int32-float64")
        assert A.shape == (12, 12)
        assert abs(A - A.T).max() > 0             # nonsymmetric file

    def test_float32_variant_matches(self):
        import struct
        # float32 files store values as f4; add a reader check via numpy
        A64 = self._load("spd-real-int32-float64")
        with open(os.path.join(DATA, "spd-real-int32-float32"), "rb") as f:
            cls, m, n, nnz = np.frombuffer(f.read(16), dtype=">i4")
            rn = np.frombuffer(f.read(4 * m), dtype=">i4")
            ci = np.frombuffer(f.read(4 * nnz), dtype=">i4")
            v = np.frombuffer(f.read(4 * nnz), dtype=">f4")
        np.testing.assert_allclose(v, A64.data, rtol=1e-7)

    def test_ex10_solve_spd_cg_icc_family(self):
        A = self._load("spd-real-int32-float64")
        b = A @ np.ones(12)
        Ad = aij_from_scipy(A)
        for ksp_t, pc_t in (("cg", "jacobi"), ("cg", "ilu"),
                            ("gmres", "lu"), ("minres", "none")):
            pc = None if pc_t == "none" else make_pc(pc_t, A=Ad, A_host=A)
            res = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type=ksp_t,
                            rtol=1e-10, maxits=200)
            assert res.converged, (ksp_t, pc_t)
            np.testing.assert_allclose(np.asarray(res.x), np.ones(12),
                                       atol=1e-7, err_msg=f"{ksp_t}+{pc_t}")

    def test_ex10_solve_nonsymmetric(self):
        A = self._load("ns-real-int32-float64")
        rng = np.random.default_rng(0)
        xex = rng.standard_normal(12)
        b = A @ xex
        Ad = aij_from_scipy(A)
        for ksp_t in ("gmres", "bcgs", "tfqmr"):
            res = ksp_solve(Ad, jnp.asarray(b),
                            pc=make_pc("lu", A=Ad, A_host=A),
                            ksp_type=ksp_t, rtol=1e-12, maxits=100)
            assert res.converged, ksp_t
            np.testing.assert_allclose(np.asarray(res.x), xex, atol=1e-6,
                                       err_msg=ksp_t)
