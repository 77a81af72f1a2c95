"""DMLabel + Gmsh ingestion + label-driven FEM (VERDICT r3 item 5).

Reference: the Plex label system (src/dm/impls/plex/plex.c:115, label
list :344), DMPlexCreateGmsh (plexcreate.c), DMPlexDistribute with
labels (plex.c:3097)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.dm.gmsh import read_gmsh, write_gmsh
from petsctpu.dm.label import (DMLabel, create_label, get_label,
                               label_vertices, mark_boundary,
                               vertex_point)
from petsctpu.dm.plex import Plex, fem_assemble_poisson


def _irregular_tri_mesh(n=8, seed=3):
    """Structured box triangulated, interior nodes jittered."""
    plex = Plex.create_box_mesh(n, n)
    rng = np.random.default_rng(seed)
    coords = plex.coords.copy()
    bnd = plex.boundary_vertices()
    interior = np.setdiff1d(np.arange(plex.num_vertices), bnd)
    h = 1.0 / n
    coords[interior] += rng.uniform(-0.3 * h, 0.3 * h,
                                    (len(interior), 2))
    return Plex(plex.cells, coords)


def _gmsh_text(plex, bc_tag=10, cell_tag=1):
    """MSH 2.2 text with boundary line elements in physical group
    bc_tag and all triangles in cell_tag."""
    coords = plex.coords
    cells = plex.cells
    e = np.concatenate([cells[:, [0, 1]], cells[:, [1, 2]],
                        cells[:, [2, 0]]])
    key = np.sort(e, axis=1)
    uniq, cnt = np.unique(key, axis=0, return_counts=True)
    bedges = uniq[cnt == 1]
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$PhysicalNames", "2",
             f'1 {bc_tag} "walls"', f'2 {cell_tag} "domain"',
             "$EndPhysicalNames",
             "$Nodes", str(len(coords))]
    for k, (x, y) in enumerate(coords):
        lines.append(f"{k + 1} {x:.16g} {y:.16g} 0")
    lines += ["$EndNodes", "$Elements",
              str(len(bedges) + len(cells))]
    eid = 1
    for a, b in bedges:
        lines.append(f"{eid} 1 2 {bc_tag} 0 {a + 1} {b + 1}")
        eid += 1
    for c in cells:
        lines.append(f"{eid} 2 2 {cell_tag} 0 "
                     f"{c[0] + 1} {c[1] + 1} {c[2] + 1}")
        eid += 1
    lines.append("$EndElements")
    return "\n".join(lines)


class TestDMLabel:
    def test_set_get_stratum(self):
        lab = DMLabel("m")
        lab.set_value([3, 1, 7], 5)
        lab.set_value(2, 5)
        lab.set_value([8], 9)
        assert lab.values() == [5, 9]
        np.testing.assert_array_equal(lab.stratum(5), [1, 2, 3, 7])
        assert lab.get_value(7) == 5
        assert lab.get_value(4) == -1
        assert lab.stratum_size(9) == 1 and lab.has_point(8)

    def test_plex_labels_and_mark_boundary(self):
        plex = Plex.create_box_mesh(4, 4)
        lab = mark_boundary(plex, "marker")
        assert get_label(plex, "marker") is lab
        verts = label_vertices(plex, lab, [1])
        np.testing.assert_array_equal(np.sort(verts),
                                      np.sort(plex.boundary_vertices()))
        # cell strata expand to vertex closures
        lab2 = create_label(plex, "cells")
        lab2.set_value([0, 1], 7)              # cell points
        vs = label_vertices(plex, lab2, [7])
        np.testing.assert_array_equal(
            vs, np.unique(plex.cells[[0, 1]].reshape(-1)))


class TestGmsh:
    def test_parse_with_physical_groups(self):
        plex0 = _irregular_tri_mesh(6)
        text = _gmsh_text(plex0)
        plex = read_gmsh(text)
        assert plex.num_cells == plex0.num_cells
        assert plex.num_vertices == plex0.num_vertices
        np.testing.assert_allclose(plex.coords, plex0.coords)
        fs = get_label(plex, "Face Sets")
        walls = get_label(plex, "walls")
        assert fs is not None and walls is not None
        bverts = label_vertices(plex, fs, [10])
        np.testing.assert_array_equal(
            np.sort(bverts), np.sort(plex.boundary_vertices()))
        cs = get_label(plex, "Cell Sets")
        assert cs.stratum_size(1) == plex.num_cells

    def test_round_trip(self, tmp_path):
        plex0 = _irregular_tri_mesh(5)
        p = str(tmp_path / "m.msh")
        write_gmsh(plex0, p)
        plex = read_gmsh(p)
        np.testing.assert_array_equal(plex.cells, plex0.cells)
        np.testing.assert_allclose(plex.coords, plex0.coords)


class TestLabelDrivenFEM:
    def test_p1_poisson_gamg_vs_scipy(self):
        """The round-3 FEM golden: load an irregular mesh from Gmsh,
        drive the Dirichlet BC from the 'walls' physical group,
        assemble P1, solve with CG+GAMG; solution matches the scipy
        direct solve of an independently assembled reference system."""
        import jax.numpy as jnp
        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.pc import make_pc

        plex = read_gmsh(_gmsh_text(_irregular_tri_mesh(12)))
        Ad, Ah, b = fem_assemble_poisson(
            plex, bc_label=("walls", [10]))

        # independent reference assembly (textbook P1, scipy only)
        pts, cells = plex.coords, plex.cells
        n = plex.num_vertices
        rowsR, colsR, valsR = [], [], []
        bref = np.zeros(n)
        for c in cells:
            x = pts[c]
            B = np.array([[x[1, 1] - x[2, 1], x[2, 1] - x[0, 1],
                           x[0, 1] - x[1, 1]],
                          [x[2, 0] - x[1, 0], x[0, 0] - x[2, 0],
                           x[1, 0] - x[0, 0]]])
            area = 0.5 * abs(np.linalg.det(
                np.array([x[1] - x[0], x[2] - x[0]])))
            Ke = (B.T @ B) / (4 * area)
            for i in range(3):
                bref[c[i]] += area / 3.0
                for j in range(3):
                    rowsR.append(c[i])
                    colsR.append(c[j])
                    valsR.append(Ke[i, j])
        AR = sp.coo_matrix((valsR, (rowsR, colsR)),
                           shape=(n, n)).tocsr()
        bnd = np.zeros(n, bool)
        bnd[label_vertices(plex, get_label(plex, "walls"), [10])] = True
        AR = AR.tolil()
        for i in np.flatnonzero(bnd):
            AR[i, :] = 0.0
            AR[:, i] = 0.0
            AR[i, i] = 1.0
        AR = AR.tocsr()
        bref[bnd] = 0.0
        np.testing.assert_allclose((Ah - AR).toarray(), 0.0,
                                   atol=1e-12)
        uref = spla.spsolve(AR, bref)

        pc = make_pc("gamg", A=Ad, A_host=Ah,
                     options=Options({"pc_gamg_coarse_eq_limit": 16}))
        r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-10,
                      maxits=100)
        assert int(r.reason) > 0
        np.testing.assert_allclose(np.asarray(r.x), uref, atol=1e-7)

    def test_distributed_label_bc_matches_serial(self):
        """Gmsh mesh -> labels carried through DMPlexDistribute ->
        sharded solve equals the serial label-driven solve."""
        import jax
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from jax.sharding import Mesh
        from petsctpu.dm.plexdist import distribute_plex
        from petsctpu.ksp import ksp_solve
        from petsctpu.parallel import par_ksp_solve

        plex = read_gmsh(_gmsh_text(_irregular_tri_mesh(10)))
        dpl = distribute_plex(plex, 4, bc_label=("walls", [10]))
        mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
        Mpl = dpl.assembled(mesh)
        Ad, Ah, b = fem_assemble_poisson(plex,
                                         bc_label=("walls", [10]))
        r_ser = ksp_solve(Ad, b, ksp_type="cg", rtol=1e-9, maxits=400)
        r_par = par_ksp_solve(mesh, Mpl,
                              np.asarray(dpl.b).reshape(-1),
                              ksp_type="cg", rtol=1e-9, maxits=400)
        x_par = np.asarray(r_par.x).reshape(-1)[dpl.perm]
        assert int(r_par.reason) > 0
        np.testing.assert_allclose(x_par, np.asarray(r_ser.x),
                                   atol=1e-6)
