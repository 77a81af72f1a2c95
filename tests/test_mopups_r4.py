"""Round-4 mop-ups: blocked MatLoad, VTK sink, MATSCATTER/BLOCKMAT/
LOCALREF wrappers (VERDICT r3 item 8)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from petsctpu.mat.base import (BlockMat, LocalRef, ScatterMat,
                               block_mat)


class TestBlockedMatLoad:
    def test_baij_load_pads_like_reference(self, tmp_path):
        """MatLoad_SeqBAIJ (baij.c:3497): AIJ stream + unit-diagonal
        padding to a bs-divisible size."""
        from petsctpu.io.viewer import (petsc_binary_read_mat_baij,
                                        petsc_binary_write_mat)
        rng = np.random.default_rng(0)
        n = 20                                 # not divisible by 3
        A = (sp.diags([2.0 * np.ones(n), rng.standard_normal(n - 1),
                       rng.standard_normal(n - 1)], [0, -1, 1])) \
            .tocsr()
        p = str(tmp_path / "a.bin")
        petsc_binary_write_mat(p, A)
        Ab, Ah = petsc_binary_read_mat_baij(p, bs=3)
        assert Ah.shape == (21, 21) and Ab.bs == 3
        assert Ah[20, 20] == 1.0               # unit-diagonal padding
        x = rng.standard_normal(21)
        np.testing.assert_allclose(
            np.asarray(Ab.mult(jnp.asarray(x, Ab.dtype))), Ah @ x,
            rtol=1e-5, atol=1e-6)

    def test_sbaij_load(self, tmp_path):
        from petsctpu.io.viewer import (petsc_binary_read_mat_sbaij,
                                        petsc_binary_write_mat)
        rng = np.random.default_rng(1)
        n = 16
        M = sp.random(n, n, density=0.2, random_state=2)
        A = sp.csr_matrix(M + M.T + 8 * sp.eye(n))
        p = str(tmp_path / "s.bin")
        petsc_binary_write_mat(p, A)
        Sb, Sh = petsc_binary_read_mat_sbaij(p, bs=2)
        x = rng.standard_normal(16)
        np.testing.assert_allclose(
            np.asarray(Sb.mult(jnp.asarray(x, Sb.dtype))), Sh @ x,
            rtol=1e-5, atol=1e-6)


class TestVTK:
    def test_structured(self, tmp_path):
        from petsctpu.io.vtk import vtk_write_structured
        u = np.arange(12.0).reshape(3, 4)
        p = str(tmp_path / "f.vtk")
        vtk_write_structured(p, {"u": u}, (3, 4))
        txt = open(p).read()
        assert "DATASET STRUCTURED_POINTS" in txt
        assert "DIMENSIONS 4 3 1" in txt
        assert "SCALARS u double 1" in txt
        assert txt.strip().splitlines()[-1] == "11"

    def test_plex_unstructured(self, tmp_path):
        from petsctpu.dm.plex import Plex
        from petsctpu.io.vtk import vtk_write_plex
        plex = Plex.create_box_mesh(3, 3)
        u = np.linspace(0, 1, plex.num_vertices)
        p = str(tmp_path / "m.vtk")
        vtk_write_plex(p, plex, point_data={"u": u},
                       cell_data={"rank": np.zeros(plex.num_cells)})
        txt = open(p).read()
        assert "DATASET UNSTRUCTURED_GRID" in txt
        assert f"POINTS {plex.num_vertices} double" in txt
        assert f"CELL_TYPES {plex.num_cells}" in txt
        assert "CELL_DATA" in txt and "POINT_DATA" in txt


class TestWrapperMats:
    def test_scatter_mat(self):
        idx = np.array([3, 0, 2, 2, 1])
        S = ScatterMat(jnp.asarray(idx, jnp.int32), (5, 4))
        x = jnp.asarray(np.arange(4.0))
        np.testing.assert_array_equal(np.asarray(S.mult(x)), x[idx])
        # multT = scatter-add transpose: S^T y
        y = jnp.asarray(np.arange(5.0) + 1)
        Sd = np.zeros((5, 4))
        Sd[np.arange(5), idx] = 1.0
        np.testing.assert_allclose(np.asarray(S.multT(y)),
                                   Sd.T @ np.asarray(y))

    def test_block_mat(self):
        from petsctpu.mat import aij_from_scipy
        rng = np.random.default_rng(3)
        A00 = sp.random(3, 3, density=0.8, random_state=1).tocsr()
        A01 = sp.random(3, 2, density=0.8, random_state=2).tocsr()
        A11 = sp.random(2, 2, density=0.9, random_state=3).tocsr()
        B = block_mat({(0, 0): aij_from_scipy(A00),
                       (0, 1): aij_from_scipy(A01),
                       (1, 1): aij_from_scipy(A11)}, [3, 2], [3, 2])
        assert B.shape == (5, 5)
        x = rng.standard_normal(5)
        dense = sp.bmat([[A00, A01], [None, A11]]).toarray()
        np.testing.assert_allclose(np.asarray(B.mult(jnp.asarray(x))),
                                   dense @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(B.multT(jnp.asarray(x))),
                                   dense.T @ x, atol=1e-12)

    def test_local_ref(self):
        """Assembly through a LocalRef lands in the parent's global
        stream (MatSetValuesLocal forwarding, mat/impls/localref)."""
        class COOBuilder:
            def __init__(self):
                self.r, self.c, self.v = [], [], []

            def add(self, rows, cols, vals):
                self.r += list(np.atleast_1d(rows))
                self.c += list(np.atleast_1d(cols))
                self.v += list(np.atleast_1d(vals))

        parent = COOBuilder()
        sub = LocalRef(parent, rmap=[4, 7, 9])
        sub.add_values([0, 1, 2], [2, 0, 1], [1.0, 2.0, 3.0])
        A = sp.coo_matrix((parent.v, (parent.r, parent.c)),
                          shape=(10, 10)).tocsr()
        assert A[4, 9] == 1.0 and A[7, 4] == 2.0 and A[9, 7] == 3.0
