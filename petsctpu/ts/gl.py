"""TSGL — implicit general linear methods (IRKS family).

Reference: src/ts/impls/implicit/gl/gl.c (general linear methods with
inherent Runge-Kutta stability, Butcher & Podhaisky; schemes registered
at gl.c:515-546 — the p=1 r=s=2 and p=2 r=s=3 IRKS tableaus are
transcribed verbatim). A GL method carries a Nordsieck-like vector
X = (x₁..x_r), x₁ = u, x_{j>1} ≈ hʲ⁻¹u⁽ʲ⁻¹⁾/(j−1)!:

  stage i:  Y_i   = h Σⱼ a_ij Ẏ_j + Σⱼ u_ij x_j   (implicit in Ẏ_i,
                                                    diagonal a_ii)
  update:   x_i⁺  = h Σⱼ b_ij Ẏ_j + Σⱼ v_ij x_j

Each implicit stage solve is a nested SNES (matrix-free Newton-Krylov),
so the whole integration is one XLA program like the other steppers.
Fixed step size and scheme order (the reference's adaptive-order
controller is host-side control logic; start vector uses the
first-same-as-last initialization X = [u, h·f(u), 0…]).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from petsctpu.ts.steppers import TSConfig, TSResult, _monitor
from petsctpu.snes.api import snes_solve


# (p, c, A, B, U, V) transcribed from gl.c TSGLRegisterAll
GL_SCHEMES = {
    1: dict(
        c=np.array([0.3, 1.0]),
        A=np.array([[0.3, 0.0], [0.7, 0.3]]),
        B=np.array([[0.7, 0.3], [0.0, 1.0]]),
        U=np.array([[1.0, 0.0], [1.0, 0.0]]),
        V=np.array([[1.0, 0.0], [0.0, 0.0]]),
    ),
    2: dict(
        c=np.array([1 / 3, 2 / 3, 1.0]),
        A=np.array([[4 / 9, 0.0, 0.0],
                    [1.03750643704090e+00, 4 / 9, 0.0],
                    [7.67024779410304e-01, -3.81140216918943e-01, 4 / 9]]),
        B=np.array([[0.767024779410304, -0.381140216918943, 4 / 9],
                    [0.0, 0.0, 1.0],
                    [-2.075048385225385, 0.621728385225383,
                     1.277197204924873]]),
        U=np.array([[1.0, -0.1111111111111109, -0.0925925925925922],
                    [1.0, -0.8152842148186744, -0.4199095530877056],
                    [1.0, 0.1696709930641948, 0.0539741070314165]]),
        V=np.array([[1.0, 0.1696709930641948, 0.0539741070314165],
                    [0.0, 0.0, 0.0],
                    [0.0, 0.176122795075129, 0.0]]),
    ),
}


def ts_gl(rhs: Callable, u0: jax.Array, order: int = 2,
          cfg: TSConfig = None, axis: Optional[str] = None,
          **kw) -> TSResult:
    import jax

    cfg = replace(cfg or TSConfig(), **kw) if kw else (cfg or TSConfig())
    sch = GL_SCHEMES[order]
    c, A, B, U, V = (sch["c"], sch["A"], sch["B"], sch["U"], sch["V"])
    s = A.shape[0]
    r = V.shape[0]
    dtype = u0.dtype

    def step(t, X, h):
        Ydots = []
        for i in range(s):                     # stages (static unroll)
            known = sum(U[i, j] * X[j] for j in range(r))
            known = known + h * sum(A[i, j] * Ydots[j] for j in range(i))
            aii = A[i, i]
            ti = t + c[i] * h

            def G(yd, known=known, aii=aii, ti=ti):
                return yd - rhs(ti, known + h * aii * yd)

            guess = Ydots[i - 1] if i else rhs(t, X[0])
            res = snes_solve(G, guess, jac="jvp", cfg=cfg.snes,
                             ksp_cfg=cfg.ksp, axis=axis)
            Ydots.append(res.x)
        Xn = []
        for i in range(r):
            xi = sum(V[i, j] * X[j] for j in range(r)) \
                + h * sum(B[i, j] * Ydots[j] for j in range(s))
            Xn.append(xi)
        return Xn

    # starting vector: x1 = u, x2 = h f(u), rest 0 (gl.c starting method)
    h0 = jnp.asarray(cfg.dt, dtype)
    X0 = [u0, h0 * rhs(jnp.asarray(cfg.t0, dtype), u0)]
    X0 += [jnp.zeros_like(u0) for _ in range(r - 2)]

    def cond(cry):
        t, X, step_n = cry
        return (step_n < cfg.max_steps) & (t < cfg.max_time - 1e-14)

    def body(cry):
        t, X, step_n = cry
        h = jnp.minimum(jnp.asarray(cfg.dt, dtype), cfg.max_time - t)
        Xn = step(t, list(X), h)
        t = t + h
        step_n = step_n + 1
        _monitor(cfg, step_n, t, Xn[0])
        return (t, tuple(Xn), step_n)

    t, X, nsteps = lax.while_loop(
        cond, body, (jnp.asarray(cfg.t0, dtype), tuple(X0), jnp.int32(0)))
    return TSResult(X[0], t, nsteps, jnp.asarray(cfg.dt, dtype))
