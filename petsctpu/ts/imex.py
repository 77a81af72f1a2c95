"""IMEX additive Runge-Kutta and Rosenbrock-W steppers.

Reference: src/ts/impls/arkimex (TSARKIMEX, additive RK tableaus,
arkimex.c ~1365 LoC) and src/ts/impls/rosw (Rosenbrock-W, rosw.c).

  * ARKIMEX: u' = f_E(t,u) + f_I(t,u); explicit tableau advances f_E,
    a stiffly-accurate DIRK tableau handles f_I — each implicit stage
    is a SNES solve nested in the step loop. Tableau: ARS(2,3,3)-style
    2-stage ARS122 and the PETSc default "3" (Kennedy-Carpenter
    ARK3(2)4L[2]SA simplified to its DIRK core) are provided as
    ("ars122", "a2") options.
  * ROSW: linearly-implicit Rosenbrock-W — ONE Jacobian evaluation per
    step, stages solve (I − γ·dt·J) k = rhs with a Krylov solve; no
    Newton iteration. Tableau: 2-stage ROS2.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from petsctpu.ksp.api import KSP_REGISTRY
from petsctpu.ksp.common import KSPConfig
from petsctpu.snes.api import SNESConfig, snes_solve

from petsctpu.ts.steppers import TSConfig, TSResult, _monitor


def ts_arkimex(f_exp: Callable, f_imp: Callable, u0: jax.Array,
               cfg: TSConfig = None, axis: Optional[str] = None,
               tableau: str = "ars122", **kw) -> TSResult:
    """Additive IMEX-RK integration of u' = f_exp(t,u) + f_imp(t,u)."""
    cfg = replace(cfg or TSConfig(), **kw) if kw else (cfg or TSConfig())
    dtype = u0.dtype

    if tableau == "ars122":
        # ARS(1,2,2): implicit midpoint on f_I + explicit midpoint on f_E
        gamma = 0.5

        def step(t, u, dt):
            # stage: y = u + dt*gamma*(fE(t,u) + fI(t+gamma dt, y))
            known = u + dt * gamma * f_exp(t, u)

            def G(y):
                return y - known - dt * gamma * f_imp(t + gamma * dt, y)

            y = snes_solve(G, u, jac="jvp", cfg=cfg.snes, ksp_cfg=cfg.ksp,
                           axis=axis).x
            un = u + dt * (f_exp(t + gamma * dt, y)
                           + f_imp(t + gamma * dt, y))
            return un
    elif tableau == "a2":
        # ARS(2,2,2) (Ascher-Ruuth-Spiteri): stiffly accurate, L-stable
        # implicit part; order 2 for both splits.
        g = 1.0 - 1.0 / float(np.sqrt(2.0))
        d = 1.0 - 1.0 / (2.0 * g)

        def step(t, u, dt):
            fE0 = f_exp(t, u)
            k1_known = u + dt * g * fE0

            def G1(y):
                return y - k1_known - dt * g * f_imp(t + g * dt, y)

            y1 = snes_solve(G1, u, jac="jvp", cfg=cfg.snes, ksp_cfg=cfg.ksp,
                            axis=axis).x
            fI1 = f_imp(t + g * dt, y1)
            fE1 = f_exp(t + g * dt, y1)
            known2 = u + dt * (d * fE0 + (1 - d) * fE1 + (1 - g) * fI1)

            def G2(y):
                return y - known2 - dt * g * f_imp(t + dt, y)

            y2 = snes_solve(G2, y1, jac="jvp", cfg=cfg.snes, ksp_cfg=cfg.ksp,
                            axis=axis).x
            return y2
    else:
        raise ValueError(f"unknown arkimex tableau {tableau!r}")

    def cond(c):
        t, u, s = c
        return (s < cfg.max_steps) & (t < cfg.max_time - 1e-14)

    def body(c):
        t, u, s = c
        dt = jnp.minimum(jnp.asarray(cfg.dt, dtype), cfg.max_time - t)
        un = step(t, u, dt)
        _monitor(cfg, s + 1, t + dt, un)
        return (t + dt, un, s + 1)

    t, u, s = lax.while_loop(cond, body,
                             (jnp.asarray(cfg.t0, dtype), u0, jnp.int32(0)))
    return TSResult(u, t, s, jnp.asarray(cfg.dt, dtype))


def ts_rosw(rhs: Callable, u0: jax.Array, cfg: TSConfig = None,
            axis: Optional[str] = None, **kw) -> TSResult:
    """Rosenbrock(-W) ROS2: one Jacobian per step, two linear solves.

      (I − γ dt J) k1 = f(u)
      (I − γ dt J) k2 = f(u + dt k1) − 2 k1
      u⁺ = u + (3/2) dt k1 + (1/2) dt k2          (γ = 1 + 1/√2)
    """
    cfg = replace(cfg or TSConfig(), **kw) if kw else (cfg or TSConfig())
    dtype = u0.dtype
    gamma = 1.0 + 1.0 / jnp.sqrt(2.0)
    solver = KSP_REGISTRY[cfg.ksp.ksp_type]

    def step(t, u, dt):
        from petsctpu.mat.base import Shell

        fu = rhs(t, u)
        # W-method: the SAME frozen Jacobian serves both stage solves
        A = Shell(ctx=(u, dt),
                  mult_fn=lambda ctx, v: v - gamma * ctx[1]
                  * jax.jvp(lambda w: rhs(t, w), (ctx[0],), (v,))[1],
                  shape=(u.shape[0], u.shape[0]))
        k1 = solver(A, fu, jnp.zeros_like(u), None, cfg.ksp, axis).x
        r2 = rhs(t + dt, u + dt * k1) - 2.0 * k1
        k2 = solver(A, r2, jnp.zeros_like(u), None, cfg.ksp, axis).x
        return u + 1.5 * dt * k1 + 0.5 * dt * k2

    def cond(c):
        t, u, s = c
        return (s < cfg.max_steps) & (t < cfg.max_time - 1e-14)

    def body(c):
        t, u, s = c
        dt = jnp.minimum(jnp.asarray(cfg.dt, dtype), cfg.max_time - t)
        un = step(t, u, dt)
        _monitor(cfg, s + 1, t + dt, un)
        return (t + dt, un, s + 1)

    t, u, s = lax.while_loop(cond, body,
                             (jnp.asarray(cfg.t0, dtype), u0, jnp.int32(0)))
    return TSResult(u, t, s, jnp.asarray(cfg.dt, dtype))
