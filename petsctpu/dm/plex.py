"""Plex — minimal unstructured simplicial mesh (DMPlex-lite).

Reference: src/dm/impls/plex/plex.c (DMPlex: cells/faces/edges/vertices
as "points" in a Hasse DAG with cone/support; PetscSection DOF layout;
the successor of the C++ Sieve/DMMesh in §2.9 of SURVEY.md). Scope
here (per SURVEY §2.9: "a minimal unstructured-mesh module, pure
Python/JAX"): 2-D triangle meshes with

  * cone/support connectivity (cells→vertices, plus constructed edges —
    the DMPlexInterpolate analog),
  * boundary detection (DMPlexMarkBoundaryFaces analog),
  * regular refinement (each triangle → 4; DMRefine analog),
  * P1 FEM assembly done the TPU way: ONE vmapped element-matrix
    kernel over all cells (batched 3×3 geometry algebra on the VPU)
    + COO segment-sum assembly into the frozen AIJ layout — the
    reference's MatSetValues loop (plex.c DMPlexMatSetClosure)
    becomes a single gather/scatter program.

Plan-time (host, numpy): connectivity, edges, boundary, sparsity.
Device (jit): element kernels + assembly + solves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclass(frozen=True)
class Plex:
    """cells: [nc, 3] vertex ids; coords: [nv, 2]."""

    cells: np.ndarray
    coords: np.ndarray

    # ---- sizes ----
    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.coords.shape[0]

    # ---- topology (cone / support / edges) ----
    def cone(self, c: int) -> np.ndarray:
        """DMPlexGetCone: vertices of cell c."""
        return self.cells[c]

    def support(self, v: int) -> np.ndarray:
        """DMPlexGetSupport: cells touching vertex v."""
        return np.where((self.cells == v).any(axis=1))[0]

    def edges(self) -> np.ndarray:
        """Unique edges [ne, 2] (DMPlexInterpolate's edge construction)."""
        e = np.concatenate([self.cells[:, [0, 1]], self.cells[:, [1, 2]],
                            self.cells[:, [2, 0]]])
        e = np.sort(e, axis=1)
        return np.unique(e, axis=0)

    def boundary_vertices(self) -> np.ndarray:
        """Vertices on edges owned by exactly one cell
        (DMPlexMarkBoundaryFaces analog)."""
        e = np.concatenate([self.cells[:, [0, 1]], self.cells[:, [1, 2]],
                            self.cells[:, [2, 0]]])
        e = np.sort(e, axis=1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        bedges = uniq[counts == 1]
        return np.unique(bedges.reshape(-1))

    # ---- refinement ----
    def refine(self) -> "Plex":
        """Regular refinement: each triangle into 4 via edge midpoints."""
        edges = self.edges()
        ne = edges.shape[0]
        nv = self.num_vertices
        emap = {tuple(e): nv + i for i, e in enumerate(edges)}
        mid_coords = 0.5 * (self.coords[edges[:, 0]]
                            + self.coords[edges[:, 1]])
        coords = np.concatenate([self.coords, mid_coords])

        def mid(a, b):
            return emap[tuple(sorted((a, b)))]

        new_cells = []
        for a, b, c in self.cells:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_cells += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        return Plex(np.asarray(new_cells, self.cells.dtype), coords)

    # ---- construction ----
    @classmethod
    def create_box_mesh(cls, nx: int, ny: int) -> "Plex":
        """Structured triangulation of the unit square (2 triangles per
        quad; DMPlexCreateBoxMesh analog)."""
        xs = np.linspace(0.0, 1.0, nx + 1)
        ys = np.linspace(0.0, 1.0, ny + 1)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        coords = np.stack([X.ravel(), Y.ravel()], axis=1)

        def vid(i, j):
            return i * (ny + 1) + j

        cells = []
        for i in range(nx):
            for j in range(ny):
                v00, v10 = vid(i, j), vid(i + 1, j)
                v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
                cells.append([v00, v10, v11])
                cells.append([v00, v11, v01])
        return cls(np.asarray(cells, np.int32), coords)


@dataclass(frozen=True)
class Plex3D:
    """3-D tetrahedral Plex: cells [nc, 4] vertex ids; coords [nv, 3]
    (DMPlex is dimension-general — plex.c handles any cell dim; this
    is the tet instantiation)."""

    cells: np.ndarray
    coords: np.ndarray

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.coords.shape[0]

    def cone(self, c: int) -> np.ndarray:
        return self.cells[c]

    def support(self, v: int) -> np.ndarray:
        return np.where((self.cells == v).any(axis=1))[0]

    _EDGE_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
    _FACE_TRIPLES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))

    def edges(self) -> np.ndarray:
        e = np.concatenate([self.cells[:, list(p)] for p in self._EDGE_PAIRS])
        return np.unique(np.sort(e, axis=1), axis=0)

    def faces(self) -> np.ndarray:
        """Unique triangular faces [nf, 3] (the height-1 stratum)."""
        f = np.concatenate([self.cells[:, list(t)]
                            for t in self._FACE_TRIPLES])
        return np.unique(np.sort(f, axis=1), axis=0)

    def boundary_vertices(self) -> np.ndarray:
        """Vertices of faces owned by exactly one tet."""
        f = np.concatenate([self.cells[:, list(t)]
                            for t in self._FACE_TRIPLES])
        uniq, counts = np.unique(np.sort(f, axis=1), axis=0,
                                 return_counts=True)
        return np.unique(uniq[counts == 1].reshape(-1))

    def refine(self) -> "Plex3D":
        """Regular 1:8 refinement: 4 corner tets + octahedron split
        along the (m01, m23) diagonal (Bey's red refinement)."""
        edges = self.edges()
        nv = self.num_vertices
        emap = {tuple(e): nv + i for i, e in enumerate(edges)}
        coords = np.concatenate([self.coords,
                                 0.5 * (self.coords[edges[:, 0]]
                                        + self.coords[edges[:, 1]])])

        def m(a, b):
            return emap[tuple(sorted((int(a), int(b))))]

        out = []
        for a, b, c, d in self.cells:
            ab, ac, ad = m(a, b), m(a, c), m(a, d)
            bc, bd, cd = m(b, c), m(b, d), m(c, d)
            out += [[a, ab, ac, ad], [ab, b, bc, bd],
                    [ac, bc, c, cd], [ad, bd, cd, d],
                    # octahedron {ab,ac,ad,bc,bd,cd} split on (ab, cd)
                    [ab, ac, ad, cd], [ab, ac, bc, cd],
                    [ab, ad, bd, cd], [ab, bc, bd, cd]]
        return Plex3D(np.asarray(out, self.cells.dtype), coords)

    @classmethod
    def create_box_mesh(cls, nx: int, ny: int, nz: int) -> "Plex3D":
        """Kuhn triangulation of the unit cube grid: 6 tets per cube
        (DMPlexCreateBoxMesh dim=3 analog)."""
        xs = [np.linspace(0.0, 1.0, k + 1) for k in (nx, ny, nz)]
        X, Y, Z = np.meshgrid(*xs, indexing="ij")
        coords = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

        def vid(i, j, k):
            return (i * (ny + 1) + j) * (nz + 1) + k

        # Kuhn: tets follow the 6 permutations of the unit-cube path
        corner_paths = [
            (0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7),
            (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7),
        ]
        cells = []
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    v = [vid(i + (s & 1), j + ((s >> 1) & 1),
                             k + ((s >> 2) & 1)) for s in range(8)]
                    for p in corner_paths:
                        cells.append([v[p[0]], v[p[1]], v[p[2]], v[p[3]]])
        return cls(np.asarray(cells, np.int32), coords)


# ---------------------------------------------------------------------------
# P1 FEM on a Plex — batched element kernels + segment-sum assembly
# ---------------------------------------------------------------------------

def p1_element_stiffness(coords_cell: jax.Array) -> jax.Array:
    """3×3 P1 stiffness for one triangle from its vertex coords [3,2]."""
    p0, p1, p2 = coords_cell[0], coords_cell[1], coords_cell[2]
    J = jnp.stack([p1 - p0, p2 - p0], axis=1)          # [2,2]
    detJ = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
    area = 0.5 * jnp.abs(detJ)
    Jinv = jnp.array([[J[1, 1], -J[0, 1]], [-J[1, 0], J[0, 0]]]) / detJ
    # reference gradients of the P1 basis
    gref = jnp.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    g = gref @ Jinv                                    # [3,2] physical grads
    return area * (g @ g.T)


def p1_element_stiffness_3d(coords_cell: jax.Array) -> jax.Array:
    """4×4 P1 stiffness for one tetrahedron from its coords [4,3]."""
    p0 = coords_cell[0]
    J = (coords_cell[1:] - p0).T                       # [3,3]
    detJ = jnp.linalg.det(J)
    vol = jnp.abs(detJ) / 6.0
    Jinv = jnp.linalg.inv(J)
    gref = jnp.array([[-1.0, -1.0, -1.0],
                      [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    g = gref @ Jinv                                    # [4,3]
    return vol * (g @ g.T)


def _simplex_measures(coords: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Per-cell area (tri) / volume (tet)."""
    p0 = coords[cells[:, 0]]
    E = np.stack([coords[cells[:, k]] - p0
                  for k in range(1, cells.shape[1])], axis=2)
    if cells.shape[1] == 3:
        return 0.5 * np.abs(E[:, 0, 0] * E[:, 1, 1]
                            - E[:, 0, 1] * E[:, 1, 0])
    return np.abs(np.linalg.det(E)) / 6.0


def p1_assemble_poisson(plex, f: Callable = None, dtype=np.float64):
    """Assemble A, b for −Δu = f with homogeneous Dirichlet boundary,
    on a 2-D (triangle) or 3-D (tet) Plex.

    Returns (A_device AIJ, A_host scipy CSR, b_device). The element
    loop is vmapped (all cells at once); assembly is host-side COO→CSR
    for the frozen sparsity plus identity boundary rows (the ex12-style
    path)."""
    from petsctpu.mat.ell import aij_from_scipy

    npc = plex.cells.shape[1]                          # nodes per cell
    cells = jnp.asarray(plex.cells)
    coords = jnp.asarray(plex.coords, dtype)
    ker = p1_element_stiffness if npc == 3 else p1_element_stiffness_3d
    Ke_np = np.asarray(jax.vmap(lambda c: ker(coords[c]))(cells))

    nc = plex.num_cells
    nv = plex.num_vertices
    rows = np.repeat(plex.cells, npc, axis=1).reshape(-1)    # i index
    cols = np.tile(plex.cells, (1, npc)).reshape(-1)         # j index
    vals = Ke_np.reshape(-1)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(nv, nv)).tocsr()

    # load vector: one-point rule (measure/npc per vertex)
    p = plex.coords
    centroids = p[plex.cells].mean(axis=1)
    measures = _simplex_measures(p, plex.cells)
    fc = (np.ones(nc) if f is None
          else np.asarray([f(c) for c in centroids], float))
    b = np.zeros(nv)
    np.add.at(b, plex.cells.reshape(-1),
              np.repeat(measures * fc / npc, npc))

    # Dirichlet boundary: identity rows/cols, zero rhs
    bnd = plex.boundary_vertices()
    mask = np.zeros(nv, bool)
    mask[bnd] = True
    A = A.tolil()
    A[bnd, :] = 0.0
    A[:, bnd] = 0.0
    for v in bnd:
        A[v, v] = 1.0
    A = sp.csr_matrix(A)
    b[bnd] = 0.0
    return aij_from_scipy(A, dtype=dtype), A, jnp.asarray(b, dtype)
