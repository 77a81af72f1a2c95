"""1-D advection-reaction IMEX model — TS ex22.

Reference: src/ts/examples/tutorials/ex22.c — a two-species
advection-reaction PDE on 0 < x < 1:

    u_t + a1*u_x = -k1*u + k2*v + s1
    v_t + a2*v_x =  k1*u - k2*v + s2

with a biased 4th-order upwind advection stencil (FormRHSFunction,
ex22.c:166-222: special rows at i=0,1,mx-2,mx-1, time-dependent
inflow u(0,t) = 1 - sin(12t)^4), treated EXPLICITLY, and the stiff
linear reaction (FormIFunction, ex22.c:133-162) treated IMPLICITLY —
the canonical ARKIMEX / Rosenbrock-W demonstration.

State layout: flat [mx*2] interleaved per grid point (the DMDA dof=2
layout), fields (u, v).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def adr_initial(mx: int, a=(1.0, 0.0), k=(1e6, 2e6), s=(0.0, 1.0),
                dtype=jnp.float64):
    """FormInitialSolution ex22.c:268-294: r = (i+1)*hx,
    u = 1 + s[1]*r, v = k[0]/k[1]*u + s[1]/k[1]."""
    hx = 1.0 / mx
    r = (np.arange(mx) + 1.0) * hx
    ik = 1.0 / k[1] if k[1] != 0.0 else 1.0
    u = 1.0 + s[1] * r
    v = k[0] * ik * u + s[1] * ik
    return jnp.asarray(np.stack([u, v], axis=1).ravel(), dtype)


def adr_rhs_advection(mx: int, a=(1.0, 0.0), s=(0.0, 1.0)):
    """Explicit part (FormRHSFunction): biased 4th-order upwind
    advection with inflow BC u0(t) = [1 - sin(12t)^4, 0]."""
    hx = 1.0 / mx
    av = jnp.asarray(a)

    def rhs(t, xflat):
        x = xflat.reshape(mx, 2)
        u0t = jnp.stack([1.0 - jnp.sin(12.0 * t) ** 4,
                         jnp.zeros_like(t)])
        xm2 = jnp.roll(x, 2, axis=0)
        xm1 = jnp.roll(x, 1, axis=0)
        xp1 = jnp.roll(x, -1, axis=0)
        xp2 = jnp.roll(x, -2, axis=0)
        f = (-1.0 / 12.0) * xm2 + (2.0 / 3.0) * xm1 \
            + (-2.0 / 3.0) * xp1 + (1.0 / 12.0) * xp2
        # boundary-biased rows (ex22.c:203-213)
        f = f.at[0].set((1.0 / 3.0) * u0t + 0.5 * x[0] - x[1]
                        + (1.0 / 6.0) * x[2])
        f = f.at[1].set((-1.0 / 12.0) * u0t + (2.0 / 3.0) * x[0]
                        - (2.0 / 3.0) * x[2] + (1.0 / 12.0) * x[3])
        f = f.at[mx - 2].set((-1.0 / 6.0) * x[mx - 4] + x[mx - 3]
                             - 0.5 * x[mx - 2] - (1.0 / 3.0) * x[mx - 1])
        f = f.at[mx - 1].set(-x[mx - 1] + x[mx - 2])
        return ((av / hx) * f).ravel()

    return rhs


def adr_rhs_reaction(mx: int, k=(1e6, 2e6), s=(0.0, 1.0)):
    """Implicit part, RHS form (from FormIFunction ex22.c:152-155
    solved for xdot): udot = -k0*u + k1*v + s0 ; vdot = k0*u - k1*v + s1."""

    def rhs(t, xflat):
        x = xflat.reshape(mx, 2)
        u, v = x[:, 0], x[:, 1]
        r = k[0] * u - k[1] * v
        f = jnp.stack([-r + s[0], r + s[1]], axis=1)
        return f.ravel()

    return rhs


def ts_reason_string(steps: int, t: float, max_steps: int,
                     max_time: float) -> str:
    """TSStep's reason priority (ts.c:2319-2324): ITS before TIME."""
    if steps >= max_steps:
        return "CONVERGED_ITS"
    if t >= max_time:
        return "CONVERGED_TIME"
    return "CONVERGED_ITERATING"
