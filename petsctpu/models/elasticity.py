"""2-D linear elasticity (plane strain, Q1 quads) — multi-DOF model.

The reference's GAMG is designed around exactly this problem class
(bs=3 elasticity is its headline use; PCSetCoordinates_AGG agg.c:246
builds rigid-body modes from node coordinates). This model produces a
bs=2 cantilever: unit square grid, left edge clamped, downward
traction on the right edge. Returns the assembled CSR (node-major,
[ux, uy] per node), node coordinates (for PCSetCoordinates), and the
RHS.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _q1_element_stiffness(E=1.0, nu=0.3, h=1.0):
    """8×8 plane-strain Q1 stiffness on an h×h square (2×2 Gauss)."""
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    D = np.array([[lam + 2 * mu, lam, 0],
                  [lam, lam + 2 * mu, 0],
                  [0, 0, mu]])
    gp = np.array([-1, 1]) / np.sqrt(3.0)
    Ke = np.zeros((8, 8))
    for xi in gp:
        for eta in gp:
            # dN/dxi for N ordered (0,0),(1,0),(1,1),(0,1)
            dN = 0.25 * np.array([
                [-(1 - eta), (1 - eta), (1 + eta), -(1 + eta)],
                [-(1 - xi), -(1 + xi), (1 + xi), (1 - xi)]])
            J = h / 2.0
            dNdx = dN / J
            B = np.zeros((3, 8))
            B[0, 0::2] = dNdx[0]
            B[1, 1::2] = dNdx[1]
            B[2, 0::2] = dNdx[1]
            B[2, 1::2] = dNdx[0]
            Ke += (B.T @ D @ B) * (J * J)
    return Ke


def elasticity_2d(mx: int, my: int, E=1.0, nu=0.3, traction=-0.1):
    """Cantilever: (mx+1)×(my+1) nodes, left edge clamped, uniform
    downward traction on the right edge. Returns (A_csr, coords, b)
    with free DOFs only (clamped DOFs eliminated)."""
    nx, ny = mx + 1, my + 1
    h = 1.0 / mx
    Ke = _q1_element_stiffness(E, nu, h)

    def nid(i, j):
        return i * ny + j

    rows, cols, vals = [], [], []
    for i in range(mx):
        for j in range(my):
            nodes = [nid(i, j), nid(i + 1, j), nid(i + 1, j + 1),
                     nid(i, j + 1)]
            dofs = np.array([[2 * n, 2 * n + 1] for n in nodes]).ravel()
            r, c = np.meshgrid(dofs, dofs, indexing="ij")
            rows.append(r.ravel())
            cols.append(c.ravel())
            vals.append(Ke.ravel())
    n_dof = 2 * nx * ny
    K = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n_dof, n_dof)).tocsr()

    X, Y = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny),
                       indexing="ij")
    coords_all = np.stack([X.ravel(), Y.ravel()], axis=1)

    b = np.zeros(n_dof)
    for j in range(ny):                       # right-edge traction (uy)
        w = h if 0 < j < ny - 1 else h / 2.0
        b[2 * nid(mx, j) + 1] = traction * w

    # eliminate clamped left-edge DOFs
    clamped = np.zeros(n_dof, bool)
    for j in range(ny):
        clamped[2 * nid(0, j)] = clamped[2 * nid(0, j) + 1] = True
    free = ~clamped
    A = K[free][:, free].tocsr()
    coords = coords_all[free[::2]]   # both dofs of a node share status
    return A, coords, b[free]
