"""MINRES (symmetric indefinite) and LSQR (least squares).

Reference: src/ksp/ksp/impls/minres/minres.c and
src/ksp/ksp/impls/lsqr/lsqr.c.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from petsctpu.core.errors import ConvergedReason
from petsctpu.ksp.common import (
    KSPConfig, SolveResult, apply_pc, check_convergence, init_history,
    monitor_cb, record,
)
from petsctpu.vec import ops


def solve_minres(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Preconditioned MINRES (Paige & Saunders Lanczos recurrence).

    Requires an SPD preconditioner. Monitors the PRECONDITIONED
    residual 2-norm like the reference: np0 = ||z||_2 (minres.c:98
    VecNorm(Z)) carried through the rotation recurrence
    np_k = np_{k-1}*|s_k| (minres.c:175)."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = b - A.mult(x) if cfg.guess_nonzero else b
    z = apply_pc(pc, r)
    beta1_sq = jnp.real(ops.dot(r, z, axis))
    beta1 = jnp.sqrt(jnp.abs(beta1_sq))
    dp = ops.norm(z, axis)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    indef = beta1_sq < 0
    reason = jnp.where((reason == 0) & indef,
                       jnp.int32(ConvergedReason.DIVERGED_INDEFINITE_PC), reason)
    rnorm0 = dp
    zero = jnp.zeros_like(b)

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        v = c["z"] / c["beta"]
        Av = A.mult(v)
        # Hermitian operator: the Lanczos alpha is real — keep the
        # whole rotation algebra in the real dtype (complex-scalar
        # builds; minres.c works in PetscRealPart the same way)
        alpha = jnp.real(ops.dot(v, Av, axis))
        z_new = apply_pc(pc, Av) - (alpha / c["beta"]) * c["z"] \
            - (c["beta"] / c["beta_old"]) * c["z_old"]
        r_lanczos = Av - (alpha / c["beta"]) * c["r"] \
            - (c["beta"] / c["beta_old"]) * c["r_old"]
        beta_new_sq = jnp.real(ops.dot(r_lanczos, z_new, axis))
        beta_new = jnp.sqrt(jnp.abs(beta_new_sq))
        # QR via Givens on the tridiagonal
        delta = c["c"] * alpha - c["c_old"] * c["s"] * c["beta"]
        gamma = jnp.sqrt(delta * delta + beta_new * beta_new)
        eps = c["s_old"] * c["beta"]
        lam = c["s"] * alpha + c["c_old"] * c["c"] * c["beta"]
        c_new = delta / gamma
        s_new = beta_new / gamma
        w = (v - lam * c["w"] - eps * c["w_old"]) / gamma
        x = c["x"] + c_new * c["eta"] * w
        eta = -s_new * c["eta"]
        dp = c["np"] * jnp.abs(s_new)
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where((reason == 0) & (beta_new_sq < 0),
                           jnp.int32(ConvergedReason.DIVERGED_INDEFINITE_PC),
                           reason)
        return dict(x=x, r=r_lanczos, r_old=c["r"], z=z_new, z_old=c["z"],
                    w=w, w_old=c["w"], beta=beta_new, beta_old=c["beta"],
                    c=c_new, c_old=c["c"], s=s_new, s_old=c["s"], eta=eta,
                    np=dp, its=its, history=history, reason=reason)

    rt = jnp.zeros((), dtype).real.dtype     # rotation scalars: real
    one = jnp.ones((), rt)
    init = dict(x=x, r=r, r_old=zero, z=z, z_old=zero, w=zero, w_old=zero,
                beta=beta1.astype(rt), beta_old=one, c=one, c_old=one,
                s=jnp.zeros((), rt), s_old=jnp.zeros((), rt),
                eta=beta1.astype(rt), np=dp.astype(rt),
                its=jnp.int32(0), history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_lsqr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """LSQR on min ‖Ax−b‖ (Golub-Kahan bidiagonalization; lsqr.c).

    With a PC the reference preconditions the normal equations
    (lsqr.c:133-144,160-184): Z = M⁻¹V, α = sqrt(V·Z), the matmul
    runs on Z and the update basis W tracks Z — reproduced here. The
    monitored norm is the recursive estimate φ̄ (lsqr.c:209)."""
    dtype = b.dtype
    m, n = A.shape
    x = x0 if cfg.guess_nonzero else jnp.zeros(n, dtype)
    u = b - A.mult(x) if cfg.guess_nonzero else b
    beta = ops.norm(u, axis)
    u = u / jnp.where(beta > 0, beta, 1.0)
    v = A.multT(u)
    if pc is None:
        alpha = ops.norm(v, axis)
        z = v
        salpha = alpha
    else:
        z = apply_pc(pc, v)
        alpha2 = ops.dot(v, z, axis).real
        salpha = jnp.sqrt(jnp.maximum(alpha2, 0.0))
        alpha = salpha
        z = z / jnp.where(salpha > 0, salpha, 1.0)
    v = v / jnp.where(salpha > 0, salpha, 1.0)
    w0 = v if pc is None else z
    dp = beta
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        src = c["v"] if pc is None else c["z"]
        u = A.mult(src) - c["alpha"] * c["u"]
        beta = ops.norm(u, axis)
        u = u / jnp.where(beta > 0, beta, 1.0)
        v = A.multT(u) - beta * c["v"]
        if pc is None:
            alpha = ops.norm(v, axis)
            z = v
        else:
            z = apply_pc(pc, v)
            alpha = jnp.sqrt(jnp.maximum(ops.dot(v, z, axis).real, 0.0))
            z = z / jnp.where(alpha > 0, alpha, 1.0)
        v = v / jnp.where(alpha > 0, alpha, 1.0)
        rho = jnp.sqrt(c["rhobar"] ** 2 + beta ** 2)
        cs = c["rhobar"] / rho
        sn = beta / rho
        theta = sn * alpha
        rhobar = -cs * alpha
        phi = cs * c["phibar"]
        phibar = sn * c["phibar"]
        x = c["x"] + (phi / rho) * c["w"]
        w = (v if pc is None else z) - (theta / rho) * c["w"]
        dp = phibar                 # ‖r‖ estimate
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        return dict(x=x, u=u, v=v, z=z, w=w, alpha=alpha, rhobar=rhobar,
                    phibar=phibar, its=its, history=history, reason=reason)

    init = dict(x=x, u=u, v=v, z=z, w=w0, alpha=alpha, rhobar=alpha,
                phibar=beta, its=jnp.int32(0), history=history,
                reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])
