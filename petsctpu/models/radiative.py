"""Nonlinear radiative transport — SNES ex18.

Reference: src/snes/examples/tutorials/ex18.c FormFunction — solves
−div(α·T^β ∇T) = 0 with β=2.5 via edge-harmonic flux differences
(d_edge = ((T₀+T₁)/2)^β), Dirichlet T=tleft on the left edge and
T=tright on the right edge imposed through ghost values, zero-flux
(Neumann) top/bottom. Every grid node carries a PDE row.
"""

from __future__ import annotations

import jax.numpy as jnp


def radiative_residual(mx: int, my: int, beta: float = 2.5,
                       tleft: float = 1.0, tright: float = 0.1):
    def F(uflat):
        X = uflat.reshape(my, mx)
        L = jnp.concatenate([jnp.full((my, 1), tleft, X.dtype),
                             X[:, :-1]], axis=1)
        R = jnp.concatenate([X[:, 1:],
                             jnp.full((my, 1), tright, X.dtype)], axis=1)
        S = jnp.concatenate([X[:1] * 0, X[:-1]], axis=0)
        N = jnp.concatenate([X[1:], X[-1:] * 0], axis=0)

        def flux(a, b):
            return (0.5 * (a + b)) ** beta * (b - a)

        fw, fe = flux(L, X), flux(X, R)
        fs, fn = flux(S, X), flux(X, N)
        j = jnp.arange(my)[:, None]
        fs = jnp.where(j == 0, 0.0, fs)
        fn = jnp.where(j == my - 1, 0.0, fn)
        return (-(fe - fw) - (fn - fs)).reshape(-1)

    return F


def radiative_initial_guess(mx: int, my: int, tleft: float = 1.0):
    """ex18.c FormInitialGuess: constant tleft."""
    return jnp.full(mx * my, tleft)
