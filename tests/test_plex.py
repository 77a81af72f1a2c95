"""Plex (DMPlex-lite) unstructured mesh: topology, refinement, P1 FEM."""

import jax.numpy as jnp
import numpy as np

from petsctpu.dm.plex import Plex, p1_assemble_poisson
from petsctpu.ksp import ksp_solve
from petsctpu.pc import make_pc


class TestTopology:
    def test_box_mesh_counts(self):
        px = Plex.create_box_mesh(3, 3)
        assert px.num_vertices == 16
        assert px.num_cells == 18
        # Euler: V - E + F(cells) = 1 for a disk
        assert 16 - px.edges().shape[0] + 18 == 1

    def test_cone_support_duality(self):
        px = Plex.create_box_mesh(2, 2)
        for c in range(px.num_cells):
            for v in px.cone(c):
                assert c in px.support(v)

    def test_boundary(self):
        px = Plex.create_box_mesh(3, 3)
        bnd = px.boundary_vertices()
        assert len(bnd) == 12          # 16 vertices, 4 interior
        for v in bnd:
            x, y = px.coords[v]
            assert x in (0.0, 1.0) or y in (0.0, 1.0)

    def test_refine(self):
        px = Plex.create_box_mesh(2, 2)
        r = px.refine()
        assert r.num_cells == 4 * px.num_cells
        assert r.num_vertices == px.num_vertices + px.edges().shape[0]
        # refined mesh area preserved
        def area(p):
            v0, v1, v2 = (p.coords[p.cells[:, k]] for k in range(3))
            return 0.5 * np.abs((v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1])
                                - (v2[:, 0] - v0[:, 0])
                                * (v1[:, 1] - v0[:, 1])).sum()
        np.testing.assert_allclose(area(r), area(px), atol=1e-14)


class TestP1Poisson:
    def test_manufactured_solution(self):
        """−Δu = 2π² sin(πx)sin(πy): P1 converges at O(h²) in max norm."""
        errs = []
        for nx in (8, 16):
            px = Plex.create_box_mesh(nx, nx)

            def f(c):
                return 2 * np.pi ** 2 * np.sin(np.pi * c[0]) \
                    * np.sin(np.pi * c[1])

            Ad, Ah, b = p1_assemble_poisson(px, f)
            res = ksp_solve(Ad, b, pc=make_pc("ilu", A=Ad, A_host=Ah),
                            ksp_type="cg", rtol=1e-10, maxits=500)
            assert res.converged
            exact = np.sin(np.pi * px.coords[:, 0]) \
                * np.sin(np.pi * px.coords[:, 1])
            errs.append(np.abs(np.asarray(res.x) - exact).max())
        assert errs[0] / errs[1] > 3.0       # ~O(h²)

    def test_gamg_on_plex(self):
        """Unstructured operator through the algebraic-MG path."""
        px = Plex.create_box_mesh(12, 12)
        Ad, Ah, b = p1_assemble_poisson(px)
        pc = make_pc("gamg", A=Ad, A_host=Ah)
        res = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8, maxits=60)
        assert res.converged
        assert int(res.its) < 25


class TestPlex3D:
    def test_box_mesh_topology_and_volume(self):
        from petsctpu.dm.plex import Plex3D, _simplex_measures
        px = Plex3D.create_box_mesh(3, 3, 3)
        assert px.num_cells == 6 * 27
        assert px.num_vertices == 4 ** 3
        vols = _simplex_measures(px.coords, px.cells)
        assert (vols > 0).all()
        np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-12)
        # boundary of the unit cube: all vertices on a face
        bnd = px.boundary_vertices()
        on_face = ((px.coords == 0.0) | (px.coords == 1.0)).any(axis=1)
        np.testing.assert_array_equal(np.sort(bnd), np.where(on_face)[0])

    def test_refine_preserves_volume(self):
        from petsctpu.dm.plex import Plex3D, _simplex_measures
        px = Plex3D.create_box_mesh(2, 2, 2)
        rf = px.refine()
        assert rf.num_cells == 8 * px.num_cells
        vols = _simplex_measures(rf.coords, rf.cells)
        assert (vols > 1e-15).all()          # no degenerate tets
        np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-12)

    def test_manufactured_solution_3d(self):
        """−Δu = 3π² sin(πx)sin(πy)sin(πz): P1 tets converge ~O(h²)."""
        from petsctpu.dm.plex import Plex3D
        errs = []
        for nx in (4, 8):
            px = Plex3D.create_box_mesh(nx, nx, nx)

            def f(c):
                return 3 * np.pi ** 2 * np.prod(np.sin(np.pi * c))

            Ad, Ah, b = p1_assemble_poisson(px, f)
            res = ksp_solve(Ad, b, pc=make_pc("ilu", A=Ad, A_host=Ah),
                            ksp_type="cg", rtol=1e-10, maxits=800)
            assert res.converged
            exact = np.prod(np.sin(np.pi * px.coords), axis=1)
            errs.append(np.abs(np.asarray(res.x) - exact).max())
        assert errs[0] / errs[1] > 2.5       # ~O(h²) under refinement
