"""PCBDDC — vertex/edge constraint coarse spaces (pc/bddc).

Reference: src/ksp/pc/impls/bddc/bddc.c. Done-criterion (VERDICT r2
item 6): BDDC beats NN-balancing iteration counts on a 4x4-subdomain
Poisson.
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.ksp import ksp_solve
from petsctpu.mat import matis_from_subdomains
from petsctpu.pc.bddc import make_bddc
from petsctpu.pc.nn import make_nn


def matis_poisson_2d(ncell=16, sub=4, jump=None):
    """Q1 Poisson on an ncell x ncell quad mesh, decomposed into
    sub x sub cell blocks with UNASSEMBLED local Neumann matrices
    (the MATIS input BDDC requires). Dirichlet dofs eliminated.
    jump: optional per-block coefficient array [sub, sub]."""
    import jax
    from petsctpu.dm.plex import PlexQuad, q1_element_stiffness

    pl = PlexQuad.create_box_mesh(ncell, ncell)
    nv = pl.num_vertices
    bnd = pl.boundary_vertices()
    free = np.setdiff1d(np.arange(nv), bnd)
    gnum = np.full(nv, -1)
    gnum[free] = np.arange(len(free))

    coords = jnp.asarray(pl.coords)
    Ke = np.asarray(jax.vmap(
        lambda c: q1_element_stiffness(coords[c]))(jnp.asarray(pl.cells)))

    # cells are created column-major (i outer, j inner) in create_box_mesh
    ci = np.arange(pl.num_cells) // ncell
    cj = np.arange(pl.num_cells) % ncell
    bs = ncell // sub
    block = (ci // bs) * sub + (cj // bs)

    locs, l2gs = [], []
    for b in range(sub * sub):
        cells_b = np.flatnonzero(block == b)
        kap = 1.0
        if jump is not None:
            kap = float(np.asarray(jump).reshape(-1)[b])
        verts = np.unique(pl.cells[cells_b])
        verts = verts[gnum[verts] >= 0]
        lmap = np.full(nv, -1)
        lmap[verts] = np.arange(len(verts))
        rows, cols, vals = [], [], []
        npc = 4
        for c in cells_b:
            vv = pl.cells[c]
            for a in range(npc):
                if gnum[vv[a]] < 0:
                    continue
                for bq in range(npc):
                    if gnum[vv[bq]] < 0:
                        continue
                    rows.append(lmap[vv[a]])
                    cols.append(lmap[vv[bq]])
                    vals.append(kap * Ke[c, a, bq])
        Ab = sp.coo_matrix((vals, (rows, cols)),
                           shape=(len(verts), len(verts))).tocsr()
        locs.append(Ab)
        l2gs.append(gnum[verts])
    return matis_from_subdomains(locs, l2gs, len(free))


class TestBDDC:
    def test_beats_nn_on_4x4_poisson(self):
        M = matis_poisson_2d(16, 4)
        Ah = M.assemble_host()
        rng = np.random.default_rng(0)
        xex = rng.standard_normal(Ah.shape[0])
        b = jnp.asarray(Ah @ xex)
        r_nn = ksp_solve(M, b, pc=make_nn(M), ksp_type="fgmres",
                         rtol=1e-8, maxits=300)
        r_bddc = ksp_solve(M, b, pc=make_bddc(M), ksp_type="fgmres",
                           rtol=1e-8, maxits=300)
        assert int(r_bddc.reason) > 0
        assert int(r_bddc.its) < int(r_nn.its), (int(r_bddc.its),
                                                 int(r_nn.its))
        x = np.asarray(r_bddc.x)
        assert np.abs(x - xex).max() < 1e-5

    def test_scalable_in_subdomains(self):
        """BDDC iteration counts stay nearly flat 2x2 -> 4x4 (the
        polylog condition bound — the point of the constraint space)."""
        its = []
        for sub, ncell in ((2, 8), (4, 16)):
            M = matis_poisson_2d(ncell, sub)
            Ah = M.assemble_host()
            rng = np.random.default_rng(1)
            b = jnp.asarray(Ah @ rng.standard_normal(Ah.shape[0]))
            r = ksp_solve(M, b, pc=make_bddc(M), ksp_type="fgmres",
                          rtol=1e-8, maxits=300)
            assert int(r.reason) > 0
            its.append(int(r.its))
        assert its[1] <= its[0] + 6, its

    def test_coefficient_jumps(self):
        """Checkerboard 1e3 coefficient jumps aligned with subdomains:
        the vertex+edge space keeps convergence where plain NN
        degrades badly."""
        jump = np.ones((4, 4))
        jump[::2, ::2] = 1e3
        jump[1::2, 1::2] = 1e-3
        M = matis_poisson_2d(16, 4, jump=jump)
        Ah = M.assemble_host()
        rng = np.random.default_rng(2)
        xex = rng.standard_normal(Ah.shape[0])
        b = jnp.asarray(Ah @ xex)
        r = ksp_solve(M, b, pc=make_bddc(M), ksp_type="fgmres",
                      rtol=1e-9, maxits=300)
        assert int(r.reason) > 0 and int(r.its) <= 40, int(r.its)
        assert np.abs(np.asarray(r.x) - xex).max() < 1e-4

    def test_3d_hex_subdomains(self):
        """2x2x2 hex-block decomposition of a 3-D Q1 Poisson: the
        signature classification produces vertex + edge + face
        constraints (3-D BDDC space) and BDDC converges fast."""
        import jax
        from petsctpu.dm.plex import PlexHex, q1_element_stiffness_3d
        import jax.numpy as jnp2

        ncell, sub = 8, 2
        pl = PlexHex.create_box_mesh(ncell, ncell, ncell)
        nv = pl.num_vertices
        bnd = pl.boundary_vertices()
        free = np.setdiff1d(np.arange(nv), bnd)
        gnum = np.full(nv, -1)
        gnum[free] = np.arange(len(free))
        coords = jnp2.asarray(pl.coords)
        Ke = np.asarray(jax.vmap(
            lambda c: q1_element_stiffness_3d(coords[c]))(
            jnp2.asarray(pl.cells)))
        nc3 = ncell
        idx = np.arange(pl.num_cells)
        ci = idx // (nc3 * nc3)
        cj = (idx // nc3) % nc3
        ck = idx % nc3
        bs = ncell // sub
        block = ((ci // bs) * sub + (cj // bs)) * sub + (ck // bs)
        locs, l2gs = [], []
        for b in range(sub ** 3):
            cells_b = np.flatnonzero(block == b)
            verts = np.unique(pl.cells[cells_b])
            verts = verts[gnum[verts] >= 0]
            lmap = np.full(nv, -1)
            lmap[verts] = np.arange(len(verts))
            rows, cols, vals = [], [], []
            for c in cells_b:
                vvk = pl.cells[c]
                for a in range(8):
                    if gnum[vvk[a]] < 0:
                        continue
                    for q in range(8):
                        if gnum[vvk[q]] < 0:
                            continue
                        rows.append(lmap[vvk[a]])
                        cols.append(lmap[vvk[q]])
                        vals.append(Ke[c, a, q])
            locs.append(sp.coo_matrix(
                (vals, (rows, cols)),
                shape=(len(verts), len(verts))).tocsr())
            l2gs.append(gnum[verts])
        M = matis_from_subdomains(locs, l2gs, len(free))
        pc = make_bddc(M)
        # 3-D 2x2x2: 1 interior cross vertex, 6 face classes (|sig|=2),
        # 12 edge classes (|sig|=4) -> vertices(per-dof) + averages
        assert pc.nprimal > 7
        Ah = M.assemble_host()
        rng = np.random.default_rng(4)
        xex = rng.standard_normal(Ah.shape[0])
        b = jnp.asarray(Ah @ xex)
        r = ksp_solve(M, b, pc=pc, ksp_type="fgmres", rtol=1e-8,
                      maxits=200)
        assert int(r.reason) > 0 and int(r.its) <= 20, int(r.its)
        assert np.abs(np.asarray(r.x) - xex).max() < 1e-5

    def test_primal_space_contents(self):
        """4x4 decomposition of a 2-D grid: 9 interior cross points
        (vertices) + 24 interface edges."""
        M = matis_poisson_2d(16, 4)
        pc = make_bddc(M)
        # count primal dof kinds via the coarse dimension: 9 vertices
        # + 24 edges = 33
        assert pc.nprimal == 33, pc.nprimal

    def test_registry_dispatch(self):
        """-pc_type bddc through the PC factory (vs nn)."""
        from petsctpu.pc import make_pc
        from petsctpu.pc.bddc import BDDCPC
        from petsctpu.pc.nn import NNPC

        M = matis_poisson_2d(8, 2)
        assert isinstance(make_pc("bddc", A=M), BDDCPC)
        assert isinstance(make_pc("nn", A=M), NNPC)
