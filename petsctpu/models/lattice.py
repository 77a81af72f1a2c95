"""2-D lattice gauge model (complex scalars).

Reference: src/ksp/ksp/examples/tutorials/ex39.c — the Wilson-fermion
lattice gauge operator H on a periodic n×n grid with 2 spin dofs per
site: per-site U(1) link phases u1 = exp(iθ1), u2 = exp(iθ2) with
θ ~ N(0, 1/β²) drawn Box-Muller from the reference's rand48 stream,
forward difference couplings in x ("right") and t ("down"), a quark
mass ρ on the spin diagonal, all scaled by 1/(2h). H is Hermitian;
the solve target is the normal-equation operator H² (ex39.c:144
MatMatMult(H, H)).

DOF numbering matches the single-process DMDA: global index
(y·n + x)·2 + c (x fastest within a row of sites, c = spin). The
drand48 stream replication (core/random.Rand48, PETSc seed
0x12345678) makes the operator ENTRY-EXACT equal to the complex
oracle's — pinned against tests/data/ex39_H.bin.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from petsctpu.core.random import Rand48


def lattice_gauge_2d(n: int = 6, beta: float = 1.0, rho: float = 1.0,
                     h: float = 1.0, rng: Rand48 = None):
    """Assemble H (complex CSR, shape (2n², 2n²)). Draw order follows
    ex39.c's x-outer / y-inner site loop, two PetscRandomGetValueReal
    draws per site."""
    rng = rng or Rand48()
    rho = rho / (2.0 * h)
    N = 2 * n * n

    def gid(x, y, c):
        return ((y % n) * n + (x % n)) * 2 + c

    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    for x in range(n):
        for y in range(n):
            r1 = 1.0 - rng.get_value()
            r2 = rng.get_value()
            R = np.sqrt(-2.0 * np.log(r1))
            cth = np.cos(2.0 * np.pi * r2)
            sth = np.sin(2.0 * np.pi * r2)
            u1 = np.exp(1j * (R * cth / beta))
            u2 = np.exp(1j * (R * sth / beta))

            # center action: +rho on spin 0, -rho on spin 1
            add(gid(x, y, 0), gid(x, y, 0), rho)
            add(gid(x, y, 1), gid(x, y, 1), -rho)

            # right action (x+1): H[(x+1, a), (x, b)] = v (+ its
            # conjugate mirror), block order per ex39.c:101-118
            for (a, b, v) in ((0, 0, -u1), (1, 0, -u1),
                              (0, 1, u1), (1, 1, u1)):
                add(gid(x + 1, y, a), gid(x, y, b), v)
                add(gid(x, y, b), gid(x + 1, y, a), np.conj(v))

            # down action (y+1), ex39.c:120-133
            for (a, b, v) in ((0, 0, -u2), (1, 0, -1j * u2),
                              (0, 1, -1j * u2), (1, 1, np.conj(u2))):
                add(gid(x, y + 1, a), gid(x, y, b), v)
                add(gid(x, y, b), gid(x, y + 1, a), np.conj(v))

    H = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    H.sum_duplicates()
    H = H * (1.0 / (2.0 * h))
    H.sort_indices()
    return H


def lattice_gauge_system(n: int = 6, beta: float = 1.0,
                         rho: float = 1.0):
    """(HtH, Htb, H): the ex39 solve setup — b = e_0,
    Htb = Hᵀb (MatMultTranspose: NON-conjugating), HtH = H·H."""
    H = lattice_gauge_2d(n, beta, rho)
    N = H.shape[0]
    b = np.zeros(N, np.complex128)
    b[0] = 1.0
    Htb = H.T @ b
    HtH = (H @ H).tocsr()
    return HtH, Htb, H
