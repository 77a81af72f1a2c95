"""Bratu problem (solid-fuel ignition) — SNES ex5 analog.

Reference: src/snes/examples/tutorials/ex5.c — 2-D Bratu
−Δu − λ·eᵘ = 0 on the unit square, u = 0 on the boundary, discretized
with a 5-point stencil on an m×n vertex grid; residual scaled like the
reference's FormFunctionLocal exactly (ex5.c:270-286 — interior:
(2u−uW−uE)·hy/hx + (2u−uN−uS)·hx/hy − λ·hx·hy·eᵘ with boundary
NEIGHBORS hard-coded to 0, decoupling the interior from boundary
values; boundary rows: 2(hy/hx + hx/hy)·u, scaled like the interior
diagonal). The decoupling matters under FAS, where boundary values
take nonzero intermediate values."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from petsctpu.dm.da import DA


def bratu_residual(da: DA, lam: float = 6.0):
    """Returns jit-safe F(u_flat) -> residual_flat."""
    m, n = da.grid
    hx = 1.0 / (m - 1)
    hy = 1.0 / (n - 1)

    def F(u):
        U = u.reshape(m, n)
        i = jnp.arange(m)[:, None]
        j = jnp.arange(n)[None, :]
        boundary = (i == 0) | (i == m - 1) | (j == 0) | (j == n - 1)
        Ub = jnp.where(boundary, 0.0, U)     # ex5.c: boundary nbrs ≡ 0
        P = jnp.pad(Ub, 1)
        uW, uE = P[:-2, 1:-1], P[2:, 1:-1]
        uS, uN = P[1:-1, :-2], P[1:-1, 2:]
        interior = ((2 * U - uW - uE) * (hy / hx)
                    + (2 * U - uS - uN) * (hx / hy)
                    - lam * hx * hy * jnp.exp(U))
        bscale = 2.0 * (hy / hx + hx / hy)
        return jnp.where(boundary, bscale * U, interior).reshape(-1)

    return F


def bratu_jacobian_template(da: DA, dtype=np.float64):
    """Stencil template (pattern donor) for FD-coloring assembly."""
    from petsctpu.mat.stencil import StencilMat
    import jax.numpy as jnp

    offs = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
    m, n = da.grid
    C = np.zeros((5, m, n), dtype)
    C[0] = 1.0
    C[1, 1:-1, 1:-1] = 1.0
    C[2, 1:-1, 1:-1] = 1.0
    C[3, 1:-1, 1:-1] = 1.0
    C[4, 1:-1, 1:-1] = 1.0
    return StencilMat(jnp.asarray(C), offs, (m, n))


def bratu_initial_guess(da: DA, lam: float = 6.0):
    """ex5.c FormInitialGuess: temp·min(dist to boundary)."""
    m, n = da.grid
    hx = 1.0 / (m - 1)
    hy = 1.0 / (n - 1)
    temp1 = lam / (lam + 1.0)
    i = np.arange(m)[:, None]
    j = np.arange(n)[None, :]
    tx = np.minimum(i, m - 1 - i) * hx
    ty = np.minimum(j, n - 1 - j) * hy
    U = temp1 * np.sqrt(np.minimum(tx, ty))
    U[0, :] = U[-1, :] = 0.0
    U[:, 0] = U[:, -1] = 0.0
    return jnp.asarray(U.reshape(-1))
