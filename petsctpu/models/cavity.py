"""Driven-cavity flow (velocity-vorticity, with temperature) — SNES ex19.

Reference: src/snes/examples/tutorials/ex19.c FormFunctionLocal — 4
fields per node (u, v, omega, temp) on a 2-D DMDA, 5-point star
stencil with first-order upwinding of the convective terms; boundary
rows use one-sided formulas applied in the reference's order (bottom,
top, left, right — later edges own the corners). Defaults match ex19:
lidvelocity = 1/(mx·my), prandtl = 1, grashof = 1.

State layout: x.reshape(my, mx, 4) with fields (u, v, omega, temp);
j (y) is the slow axis exactly like the reference's x[j][i].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cavity_residual(mx: int, my: int, lidvelocity: float = None,
                    prandtl: float = 1.0, grashof: float = 1.0):
    if lidvelocity is None:
        lidvelocity = 1.0 / (mx * my)
    dhx, dhy = float(mx - 1), float(my - 1)
    hx, hy = 1.0 / dhx, 1.0 / dhy
    hxdhy, hydhx = hx * dhy, hy * dhx

    def F(xflat):
        X = xflat.reshape(my, mx, 4)
        P = jnp.pad(X, ((1, 1), (1, 1), (0, 0)))
        C = X
        W = P[1:-1, :-2]
        E = P[1:-1, 2:]
        S = P[:-2, 1:-1]
        N = P[2:, 1:-1]
        u, v, om, te = C[..., 0], C[..., 1], C[..., 2], C[..., 3]

        vx, vy = u, v
        avx, avy = jnp.abs(vx), jnp.abs(vy)
        vxp, vxm = 0.5 * (vx + avx), 0.5 * (vx - avx)
        vyp, vym = 0.5 * (vy + avy), 0.5 * (vy - avy)

        def lap(c, w, e, s, n):
            return (2.0 * c - w - e) * hydhx + (2.0 * c - s - n) * hxdhy

        fu = lap(u, W[..., 0], E[..., 0], S[..., 0], N[..., 0]) \
            - 0.5 * (N[..., 2] - S[..., 2]) * hx
        fv = lap(v, W[..., 1], E[..., 1], S[..., 1], N[..., 1]) \
            + 0.5 * (E[..., 2] - W[..., 2]) * hy
        fo = lap(om, W[..., 2], E[..., 2], S[..., 2], N[..., 2]) \
            + (vxp * (om - W[..., 2]) + vxm * (E[..., 2] - om)) * hy \
            + (vyp * (om - S[..., 2]) + vym * (N[..., 2] - om)) * hx \
            - 0.5 * grashof * (E[..., 3] - W[..., 3]) * hy
        ft = lap(te, W[..., 3], E[..., 3], S[..., 3], N[..., 3]) \
            + prandtl * ((vxp * (te - W[..., 3])
                          + vxm * (E[..., 3] - te)) * hy
                         + (vyp * (te - S[..., 3])
                            + vym * (N[..., 3] - te)) * hx)
        Fg = jnp.stack([fu, fv, fo, ft], axis=-1)

        # boundary overrides, reference order: bottom, top, left, right
        Fg = Fg.at[0, :, 0].set(u[0, :])
        Fg = Fg.at[0, :, 1].set(v[0, :])
        Fg = Fg.at[0, :, 2].set(om[0, :] + (u[1, :] - u[0, :]) * dhy)
        Fg = Fg.at[0, :, 3].set(te[0, :] - te[1, :])

        Fg = Fg.at[-1, :, 0].set(u[-1, :] - lidvelocity)
        Fg = Fg.at[-1, :, 1].set(v[-1, :])
        Fg = Fg.at[-1, :, 2].set(om[-1, :] + (u[-1, :] - u[-2, :]) * dhy)
        Fg = Fg.at[-1, :, 3].set(te[-1, :] - te[-2, :])

        Fg = Fg.at[:, 0, 0].set(u[:, 0])
        Fg = Fg.at[:, 0, 1].set(v[:, 0])
        Fg = Fg.at[:, 0, 2].set(om[:, 0] - (v[:, 1] - v[:, 0]) * dhx)
        Fg = Fg.at[:, 0, 3].set(te[:, 0])

        Fg = Fg.at[:, -1, 0].set(u[:, -1])
        Fg = Fg.at[:, -1, 1].set(v[:, -1])
        Fg = Fg.at[:, -1, 2].set(om[:, -1] - (v[:, -1] - v[:, -2]) * dhx)
        Fg = Fg.at[:, -1, 3].set(te[:, -1] - float(grashof > 0))

        return Fg.reshape(-1)

    return F


def cavity_initial_guess(mx: int, my: int, grashof: float = 1.0,
                         dtype=np.float64):
    """ex19.c FormInitialGuess: zero flow, linear temperature ramp."""
    dx = 1.0 / (mx - 1)
    X = np.zeros((my, mx, 4), dtype)
    i = np.arange(mx)
    X[:, :, 3] = (grashof > 0) * i[None, :] * dx
    return jnp.asarray(X.reshape(-1))


def cavity_jacobian_pattern(mx: int, my: int):
    """Host sparsity superset for FD coloring: full 4x4 blocks on the
    5-point star (what DMDA preallocation produces, fdda.c)."""
    import scipy.sparse as sp

    n = mx * my
    Ii = np.arange(n)
    j = Ii // mx
    i = Ii % mx
    rows, cols = [Ii], [Ii]
    for cond, off in ((i > 0, -1), (i < mx - 1, 1),
                      (j > 0, -mx), (j < my - 1, mx)):
        r = Ii[cond]
        rows.append(r)
        cols.append(r + off)
    adj = sp.coo_matrix((np.ones(sum(len(r) for r in rows)),
                         (np.concatenate(rows), np.concatenate(cols))),
                        shape=(n, n)).tocsr()
    return sp.kron(adj, np.ones((4, 4)), format="csr")
