"""ExodusII-lite reader/writer (dm/exodus.py) — DMPlexCreateExodus
analog (plexexodusii.c:13) over scipy's pure-python NetCDF3 parser.
Round-trips our own meshes including Vertex/Face Sets labels."""

import numpy as np
import pytest

from petsctpu.dm.exodus import read_exodus, write_exodus
from petsctpu.dm.interp import (boundary_faces, face_centroids,
                                face_point, label_faces, point_face)
from petsctpu.dm.label import create_label, get_label, vertex_point
from petsctpu.dm.plex import Plex, Plex3D, PlexHex, PlexQuad


@pytest.mark.parametrize("mk,n", [
    (Plex.create_box_mesh, (4, 3)),
    (PlexQuad.create_box_mesh, (3, 3)),
    (Plex3D.create_box_mesh, (2, 2, 2)),
    (PlexHex.create_box_mesh, (3, 2, 2)),
])
def test_roundtrip_mesh(tmp_path, mk, n):
    plex = mk(*n)
    p = str(tmp_path / "m.exo")
    write_exodus(p, plex)
    rd = read_exodus(p)
    np.testing.assert_array_equal(rd.cells, plex.cells)
    np.testing.assert_allclose(rd.coords, plex.coords)
    cs = get_label(rd, "Cell Sets")
    assert cs is not None and cs.stratum_size(1) == plex.num_cells


def test_roundtrip_side_and_node_sets(tmp_path):
    plex = Plex.create_box_mesh(5, 4)
    bf = boundary_faces(plex)
    cen = face_centroids(plex, bf)
    left = bf[cen[:, 0] < 1e-12]
    right = bf[np.abs(cen[:, 0] - 1.0) < 1e-12]
    fs = create_label(plex, "Face Sets")
    fs.set_value(face_point(plex, left), 10)
    fs.set_value(face_point(plex, right), 20)
    vs = create_label(plex, "Vertex Sets")
    corner = np.flatnonzero((np.abs(plex.coords) < 1e-12).all(axis=1))
    vs.set_value(vertex_point(plex, corner), 7)

    p = str(tmp_path / "m.exo")
    write_exodus(p, plex)
    rd = read_exodus(p)
    fs2 = get_label(rd, "Face Sets")
    assert fs2.values() == [10, 20]
    # facet groups land on the same geometric faces
    f10 = label_faces(rd, fs2, [10])
    np.testing.assert_allclose(face_centroids(rd, f10)[:, 0], 0.0,
                               atol=1e-14)
    assert len(f10) == len(left)
    vs2 = get_label(rd, "Vertex Sets")
    assert vs2.values() == [7]
    assert vs2.stratum_size(7) == 1


def test_assembly_with_exodus_sidesets(tmp_path):
    """The Neumann patch test (u*=x) driven entirely off an Exodus
    file's side sets — the DMPlexCreateExodus -> DMAddBoundary flow."""
    import jax.numpy as jnp

    from petsctpu.dm.label import vertex_point as vp
    from petsctpu.dm.plex import fem_assemble_poisson
    from petsctpu.ksp import ksp_solve

    plex = Plex.create_box_mesh(5, 4)
    bf = boundary_faces(plex)
    cen = face_centroids(plex, bf)
    fs = create_label(plex, "Face Sets")
    fs.set_value(face_point(plex,
                            bf[np.abs(cen[:, 0] - 1.0) < 1e-12]), 7)
    p = str(tmp_path / "m.exo")
    write_exodus(p, plex)
    rd = read_exodus(p)
    lab = get_label(rd, "Face Sets")
    diri = np.flatnonzero(np.abs(rd.coords[:, 0]) < 1e-12)
    lab.set_value(vp(rd, diri), 1)
    Ad, Ah, b = fem_assemble_poisson(
        rd, f=lambda c: 0.0, bc_label=("Face Sets", [1]),
        neumann=("Face Sets", [7], 1.0))
    r = ksp_solve(Ad, b, ksp_type="cg", rtol=1e-13, maxits=500)
    np.testing.assert_allclose(np.asarray(r.x), rd.coords[:, 0],
                               atol=1e-9)
