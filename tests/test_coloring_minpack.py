"""MINPACK SL/LF/ID colorings (mat/coloring.py) vs the reference
oracle's MatGetColoring — ENTIRE color vectors must match, including
the inode-compressed pipeline (tests/data/oracle_coloring minted by a
MatLoad+MatGetColoring probe against the hand-built oracle)."""

import os

import numpy as np
import pytest

from petsctpu.io.viewer import petsc_binary_read_system
from petsctpu.mat.coloring import (inode_groups, minpack_coloring,
                                   minpack_coloring_inode,
                                   stencil_coloring)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _ref(f, t):
    txt = open(os.path.join(DATA, "oracle_coloring",
                            f"{f}_{t}.txt")).read().split()
    return int(txt[1]), np.array([int(x) for x in txt[2:]], np.int64)


@pytest.mark.parametrize("f", ["ex10_nonsym", "ex10_poisson",
                               "ex10_baij3"])
@pytest.mark.parametrize("t", ["sl", "lf", "id"])
def test_minpack_coloring_vector_exact(f, t):
    A, _ = petsc_binary_read_system(os.path.join(DATA, f + ".bin"))
    nc_ref, ref = _ref(f, t)
    ours = minpack_coloring_inode(A, t)
    assert int(ours.max()) + 1 == nc_ref
    np.testing.assert_array_equal(ours, ref)


def test_inode_detection():
    A, _ = petsc_binary_read_system(os.path.join(DATA,
                                                 "ex10_baij3.bin"))
    ns = inode_groups(A)
    assert ns is not None and set(np.unique(ns)) == {3}   # bs=3 blocks
    A2, _ = petsc_binary_read_system(os.path.join(DATA,
                                                  "ex10_nonsym.bin"))
    assert inode_groups(A2) is None


def test_colorings_are_valid_distance2():
    """Every variant must be a valid FD coloring: no two columns of
    one color share a row."""
    import scipy.sparse as sp
    A, _ = petsc_binary_read_system(os.path.join(DATA,
                                                 "ex10_nonsym.bin"))
    A = sp.csr_matrix(A)
    for t in ("sl", "lf", "id"):
        c = minpack_coloring(A, t)
        for i in range(A.shape[0]):
            cols = A.indices[A.indptr[i]:A.indptr[i + 1]]
            assert len(set(c[cols])) == len(cols), (t, i)


def test_stencil_coloring_matches_fdda_3d():
    """DMDA star-stencil coloring = fdda.c's
    (i%3) + 3*(j%3) + 9*(k%3) (DMCreateColoring_DA_3d_MPIAIJ) with
    i the fastest-varying axis."""
    m = 7
    offsets = ((0, 0, 0), (0, 0, -1), (0, 0, 1), (0, -1, 0),
               (0, 1, 0), (-1, 0, 0), (1, 0, 0))
    ours = stencil_coloring((m, m, m), offsets).reshape(m, m, m)
    k, j, i = np.meshgrid(np.arange(m), np.arange(m), np.arange(m),
                          indexing="ij")
    ref = (i % 3) + 3 * (j % 3) + 9 * (k % 3)
    np.testing.assert_array_equal(ours, ref)
