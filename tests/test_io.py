import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.io import (load_any_matrix, load_mat, load_system, load_vec,
                         petsc_binary_read_mat, petsc_binary_read_vec,
                         petsc_binary_write_mat, petsc_binary_write_vec,
                         save_mat, save_system, save_vec)
from petsctpu.models import laplacian_2d
from petsctpu.vec.indexset import IS, LocalToGlobalMapping


class TestIS:
    def test_general_stride_block(self):
        g = IS.general([3, 1, 4])
        np.testing.assert_array_equal(g.indices, [3, 1, 4])
        s = IS.stride(4, first=2, step=3)
        np.testing.assert_array_equal(s.indices, [2, 5, 8, 11])
        b = IS.block(2, [0, 3])
        np.testing.assert_array_equal(b.indices, [0, 1, 6, 7])

    def test_set_ops(self):
        a = IS.general([0, 2, 4])
        assert list(a.complement(0, 6).indices) == [1, 3, 5]
        assert list(a.union(IS.general([1, 2])).indices) == [0, 1, 2, 4]
        assert list(a.difference(IS.general([2])).indices) == [0, 4]

    def test_invert_permutation(self):
        p = IS.general([2, 0, 1])
        np.testing.assert_array_equal(p.invert_permutation().indices,
                                      [1, 2, 0])

    def test_l2g(self):
        m = LocalToGlobalMapping([10, 20, 30])
        np.testing.assert_array_equal(m.apply([0, 2]), [10, 30])
        np.testing.assert_array_equal(m.apply_inverse([20, 99]), [1, -1])


class TestNpz:
    def test_vec_roundtrip(self, tmp_path):
        x = np.random.default_rng(0).standard_normal(17)
        p = str(tmp_path / "v.npz")
        save_vec(p, x)
        np.testing.assert_array_equal(load_vec(p), x)

    def test_mat_roundtrip(self, tmp_path):
        A = laplacian_2d(5, 6)
        p = str(tmp_path / "m.npz")
        save_mat(p, A)
        assert (load_mat(p) != A).nnz == 0

    def test_system_roundtrip(self, tmp_path):
        A = laplacian_2d(4, 4)
        b = np.arange(16.0)
        p = str(tmp_path / "s.npz")
        save_system(p, A, b=b)
        A2, b2, x2 = load_system(p)
        assert (A2 != A).nnz == 0
        np.testing.assert_array_equal(b2, b)
        assert x2 is None


class TestPetscBinary:
    def test_mat_roundtrip(self, tmp_path):
        A = laplacian_2d(6, 4) + sp.random(24, 24, density=0.1,
                                           random_state=0)
        A = A.tocsr()
        p = str(tmp_path / "m.petsc")
        petsc_binary_write_mat(p, A)
        A2 = petsc_binary_read_mat(p)
        np.testing.assert_allclose(A2.toarray(), A.toarray(), rtol=1e-15)

    def test_vec_roundtrip(self, tmp_path):
        x = np.random.default_rng(1).standard_normal(9)
        p = str(tmp_path / "v.petsc")
        petsc_binary_write_vec(p, x)
        np.testing.assert_allclose(petsc_binary_read_vec(p), x)

    def test_endianness_is_big(self, tmp_path):
        """First 4 bytes must be the classid big-endian (reference
        format compat)."""
        p = str(tmp_path / "v.petsc")
        petsc_binary_write_vec(p, np.zeros(3))
        raw = open(p, "rb").read(4)
        assert int.from_bytes(raw, "big") == 1211214

    def test_load_any_dispatch(self, tmp_path):
        A = laplacian_2d(4, 4)
        p1 = str(tmp_path / "a.npz")
        save_mat(p1, A)
        p2 = str(tmp_path / "a.petsc")
        petsc_binary_write_mat(p2, A)
        assert (load_any_matrix(p1) != A).nnz == 0
        assert (load_any_matrix(p2) != A).nnz == 0


class TestResumeDeterminism:
    def test_solve_resume_identical(self, tmp_path):
        """Checkpoint mid-workflow: loading must reproduce the exact
        arrays (deterministic layout, SURVEY §5.4)."""
        import jax.numpy as jnp
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc

        A = laplacian_2d(8, 8)
        b = A @ np.ones(64)
        p = str(tmp_path / "ck.npz")
        save_system(p, A, b=b)
        A2, b2, _ = load_system(p)
        Ad1, Ad2 = aij_from_scipy(A), aij_from_scipy(A2)
        r1 = ksp_solve(Ad1, jnp.asarray(b), pc=make_pc("jacobi", A=Ad1),
                       ksp_type="cg", rtol=1e-10)
        r2 = ksp_solve(Ad2, jnp.asarray(b2), pc=make_pc("jacobi", A=Ad2),
                       ksp_type="cg", rtol=1e-10)
        assert int(r1.its) == int(r2.its)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


class TestHDF5Viewer:
    def test_vec_roundtrip(self, tmp_path):
        from petsctpu.io.viewer import hdf5_save_vec, hdf5_load_vec
        p = str(tmp_path / "v.h5")
        x = np.random.default_rng(0).standard_normal(37)
        hdf5_save_vec(p, "solution", x)
        hdf5_save_vec(p, "rhs", x * 2)          # second object, same file
        np.testing.assert_array_equal(hdf5_load_vec(p, "solution"), x)
        np.testing.assert_array_equal(hdf5_load_vec(p, "rhs"), 2 * x)
        hdf5_save_vec(p, "solution", x + 1)     # overwrite
        np.testing.assert_array_equal(hdf5_load_vec(p, "solution"), x + 1)

    def test_mat_roundtrip(self, tmp_path):
        import scipy.sparse as sp
        from petsctpu.io.viewer import hdf5_save_mat, hdf5_load_mat
        from petsctpu.models import laplacian_2d
        p = str(tmp_path / "m.h5")
        A = laplacian_2d(6, 5)
        hdf5_save_mat(p, "A", A)
        B = hdf5_load_mat(p, "A")
        assert (A != B).nnz == 0
