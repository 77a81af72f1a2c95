"""Distributed overlapping ASM (pc/parallel.make_dist_asm) — the
DMPlexDistribute-overlap + PCASM pipeline over an irregular mesh:
overlap-1 restricted ASM CG on the distributed operator must match the
serial PCASM with the same subdomains iteration-for-iteration
(VERDICT r5 item 5; reference plex.c:3085-3126 + mpiov.c:17 +
asm.c:175)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.dm.plex import Plex, fem_assemble_poisson
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.parallel import sharded_aij_from_scipy
from petsctpu.parallel.api import par_ksp_solve, unshard_vector
from petsctpu.pc.asm import make_asm
from petsctpu.pc.parallel import make_dist_asm

multidev = pytest.mark.skipif(len(jax.devices()) < 4,
                              reason="needs 4 devices")


def _irregular_system():
    """Unstructured-ish P1 Poisson: refined box mesh with perturbed
    interior coordinates (deterministic)."""
    plex = Plex.create_box_mesh(7, 6).refine()
    rng = np.random.default_rng(3)
    coords = plex.coords.copy()
    bnd = plex.boundary_vertices()
    mask = np.ones(len(coords), bool)
    mask[bnd] = False
    coords[mask] += 0.15 * (rng.random((mask.sum(), 2)) - 0.5) \
        / np.sqrt(len(coords))
    plex = Plex(plex.cells, coords)
    _, A, b = fem_assemble_poisson(plex)
    return A, np.asarray(b)


@multidev
def test_dist_asm_matches_serial_iterations():
    from jax.sharding import Mesh

    A, b = _irregular_system()
    Pn = 4
    Ash, part = sharded_aij_from_scipy(A, Pn)
    pc = make_dist_asm(A, part, overlap=1)
    mesh = Mesh(np.array(jax.devices()[:Pn]), ("rows",))
    # restricted ASM is a NONSYMMETRIC preconditioner -> GMRES (the
    # reference pairs -pc_type asm with gmres in its tutorials)
    r = par_ksp_solve(mesh, Ash, b, pc=pc, ksp_type="gmres",
                      rtol=1e-8, maxits=400)
    assert int(r.reason) > 0

    # serial PCASM with the SAME subdomains: owned = layout ranges,
    # outer = overlap-1 matrix-connectivity expansion
    lay = part.layout
    s, n = lay.shard_size, A.shape[0]
    Ap = sp.csr_matrix(A)
    blocks, outer = [], []
    for p in range(Pn):
        own = np.arange(p * s, min((p + 1) * s, n))
        idx = own
        cols = Ap[idx].indices
        idx = np.union1d(idx, cols)
        blocks.append(own)
        outer.append(idx)
    pc_s = make_asm(A, blocks=blocks, outer=outer, restricted=True,
                    sub_pc="lu")
    Ad = aij_from_scipy(A)
    rs = ksp_solve(Ad, jnp.asarray(b), pc=pc_s, ksp_type="gmres",
                   rtol=1e-8, maxits=400)
    assert int(rs.reason) > 0
    assert int(r.its) == int(rs.its), (int(r.its), int(rs.its))
    x = unshard_vector(r.x, part.layout)[:n]
    np.testing.assert_allclose(x, np.asarray(rs.x), atol=1e-6)


@multidev
def test_dist_asm_beats_bjacobi():
    """Overlap must help: ASM(1) converges in fewer iterations than
    zero-overlap block Jacobi on the same partition."""
    from jax.sharding import Mesh

    from petsctpu.pc.parallel import make_bjacobi

    A, b = _irregular_system()
    Pn = 4
    Ash, part = sharded_aij_from_scipy(A, Pn)
    mesh = Mesh(np.array(jax.devices()[:Pn]), ("rows",))
    r_asm = par_ksp_solve(mesh, Ash, b, pc=make_dist_asm(A, part, 1),
                          ksp_type="gmres", rtol=1e-8, maxits=400)
    r_bj = par_ksp_solve(mesh, Ash, b,
                         pc=make_bjacobi(part, sub_pc="lu"),
                         ksp_type="gmres", rtol=1e-8, maxits=400)
    assert int(r_asm.its) < int(r_bj.its), (int(r_asm.its),
                                            int(r_bj.its))


def test_overlap_labels_survive_distribution():
    """Labels (incl. facet points) survive the renumbering that
    distribution applies (DMPlexDistribute carries labels)."""
    from petsctpu.dm.interp import (boundary_faces, face_centroids,
                                    face_point, label_faces)
    from petsctpu.dm.label import create_label, label_vertices

    plex = Plex.create_box_mesh(5, 5)
    bf = boundary_faces(plex)
    cen = face_centroids(plex, bf)
    left = bf[cen[:, 0] < 1e-12]
    lab = create_label(plex, "inflow")
    lab.set_value(face_point(plex, left), 3)
    verts = label_vertices(plex, lab, [3])
    # distribute_plex keeps GLOBAL vertex ids through its vnew map —
    # the label's facet closure must land on the same coordinates
    from petsctpu.dm.plexdist import _renumber_by_owner
    from petsctpu.mat.partition import partition_kway
    cells = plex.cells
    nc, npc = cells.shape
    B = sp.coo_matrix((np.ones(nc * npc),
                       (np.repeat(np.arange(nc), npc),
                        cells.reshape(-1))),
                      shape=(nc, plex.num_vertices)).tocsr()
    part = partition_kway((B @ B.T).tocsr(), 4)
    order, vnew, owner = _renumber_by_owner(plex, 4, part)
    moved = vnew[verts]
    np.testing.assert_allclose(
        np.sort(plex.coords[order][moved][:, 0]),
        np.zeros(len(verts)), atol=1e-14)
