"""Additional Krylov methods: CR, TFQMR, CGNE, FBCGS.

Reference: src/ksp/ksp/impls/{cr,tfqmr,cgne,bcgs/fbcgs}.
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


def solve_cr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Preconditioned conjugate residuals (cr.c) for symmetric systems."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = apply_pc(pc, b - A.mult(x)) if cfg.guess_nonzero else apply_pc(pc, b)

    def B(v):
        return apply_pc(pc, A.mult(v))

    Br = B(r)
    rho = ops.dot(r, Br, axis)
    dp = ops.norm(r, axis)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        Bp = c["Bp"]
        alpha_den = ops.dot(Bp, Bp, axis)
        alpha = c["rho"] / alpha_den
        x = c["x"] + alpha * c["p"]
        r = c["r"] - alpha * Bp
        Br = B(r)
        rho_l = jnp.vdot(r, Br)
        rr_l = jnp.vdot(r, r).real
        rho_new, rr = ops.reduce_all((rho_l, rr_l), axis)
        dp = jnp.sqrt(rr)
        its = c["its"] + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where((reason == 0) & (alpha_den == 0),
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN),
                           reason)
        beta = rho_new / c["rho"]
        p = r + beta * c["p"]
        Bp = Br + beta * Bp
        return dict(x=x, r=r, p=p, Bp=Bp, rho=rho_new, its=its,
                    history=history, reason=reason)

    init = dict(x=x, r=r, p=r, Bp=Br, rho=rho, its=jnp.int32(0),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_tfqmr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Transpose-free QMR (Freund; tfqmr.c)."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = apply_pc(pc, b - A.mult(x)) if cfg.guess_nonzero else apply_pc(pc, b)

    def B(v):
        return apply_pc(pc, A.mult(v))

    dp0 = ops.norm(r0, axis)
    history = record(init_history(cfg, dtype), 0, dp0)
    monitor_cb(cfg, 0, dp0)
    reason = check_convergence(dp0, dp0, jnp.int32(0), cfg)
    rnorm0 = dp0
    zero = jnp.zeros_like(b)

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        first = its == 0
        rho = ops.dot(c["rt"], c["r"], axis)
        beta = jnp.where(first, 0.0, rho / c["rho_old"])
        u = c["r"] + beta * c["q"]
        p = u + beta * (c["q"] + beta * c["p"])
        v = B(p)
        sigma = ops.dot(c["rt"], v, axis)
        alpha = rho / sigma
        q = u - alpha * v
        r = c["r"] - alpha * B(u + q)
        # QMR smoothing over the two half-steps
        dp = ops.norm(r, axis)
        theta = dp / c["tau"]
        cfac = 1.0 / jnp.sqrt(1.0 + theta * theta)
        tau = c["tau"] * theta * cfac
        eta = cfac * cfac * alpha
        d = (u + q) + (c["theta"] ** 2 * c["eta"] / alpha) * c["d"]
        x = c["x"] + eta * d
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where((reason == 0) & ((rho == 0) | (sigma == 0)),
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN),
                           reason)
        return dict(x=x, r=r, rt=c["rt"], p=p, q=q, d=d, rho_old=rho,
                    tau=tau, theta=theta, eta=eta, its=its, history=history,
                    reason=reason)

    one = jnp.ones((), dtype)
    # theta/tau are norm ratios — REAL even for complex scalars
    init = dict(x=x, r=r0, rt=r0, p=zero, q=zero, d=zero, rho_old=one,
                tau=dp0, theta=jnp.zeros((), dp0.dtype),
                eta=jnp.zeros((), dtype),
                its=jnp.int32(0), history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_cgne(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """CG on the normal equations AᵀA x = Aᵀ b (cgne.c)."""
    from petsctpu.ksp.cg import solve_cg
    from petsctpu.mat.base import Normal

    bt = A.multT(b)
    return solve_cg(Normal(A), bt, x0, pc, cfg, axis)


def solve_fbcgs(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Flexible BiCGStab (fbcgs.c): right preconditioning, so the PC may
    vary; monitors the TRUE residual."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = b - A.mult(x) if cfg.guess_nonzero else b
    rt = r
    dp = ops.norm(r, axis)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp
    zero = jnp.zeros_like(b)

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        rho = ops.dot(c["rt"], c["r"], axis)
        first = its == 0
        beta = jnp.where(first, 0.0,
                         (rho / c["rho_old"]) * (c["alpha"] / c["omega"]))
        p = c["r"] + beta * (c["p"] - c["omega"] * c["v"])
        ph = apply_pc(pc, p)
        v = A.mult(ph)
        rtv = ops.dot(c["rt"], v, axis)
        alpha = rho / rtv
        s = c["r"] - alpha * v
        sh = apply_pc(pc, s)
        t = A.mult(sh)
        tt_l = jnp.vdot(t, t).real
        ts_l = jnp.vdot(t, s)
        tt, ts = ops.reduce_all((tt_l, ts_l), axis)
        omega = ts / jnp.where(tt > 0, tt, 1.0)
        x = c["x"] + alpha * ph + omega * sh
        r = s - omega * t
        dp = ops.norm(r, axis)
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        breakdown = (rho == 0) | (rtv == 0) | (omega == 0)
        reason = jnp.where((reason == 0) & breakdown,
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN),
                           reason)
        return dict(x=x, r=r, rt=c["rt"], p=p, v=v, rho_old=rho, alpha=alpha,
                    omega=omega, its=its, history=history, reason=reason)

    init = dict(x=x, r=r, rt=rt, p=zero, v=zero, rho_old=jnp.ones((), dtype),
                alpha=jnp.ones((), dtype), omega=jnp.ones((), dtype),
                its=jnp.int32(0), history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_fbcgsr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """FBiCGStab-R (src/ksp/ksp/impls/bcgs/fbcgsr/fbcgsr.c): the
    single-rendezvous flexible BiCGStab — mathematically equivalent to
    fbcgs but with the six inner products packed into TWO fused
    reductions per iteration ((tau,sigma) then (xi1..xi4)), and the
    residual norm recovered algebraically from xi1 - omega*xi2 instead
    of a third reduction (fbcgsr.c:105-167). Right preconditioning
    only, like the reference. The merged sums use the reference's
    unconjugated products (its VEC_ReduceArithmetic loops)."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = b - A.mult(x) if cfg.guess_nonzero else b
    rp = r
    dp = ops.norm(r, axis)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        p2 = apply_pc(pc, c["p"])
        v = A.mult(p2)
        # fused reduction 1: tau = (r,rp), sigma = (v,rp)
        tau_l = jnp.sum(c["r"] * rp)
        sigma_l = jnp.sum(v * rp)
        tau, sigma = ops.reduce_all((tau_l, sigma_l), axis)
        tau = jnp.where(its == 0, (rnorm0 * rnorm0).astype(dtype), tau)
        # guard the division: the reference errors out on sigma==0
        # before using alpha (fbcgsr.c breakdown check) — keep the
        # iterate finite and let the breakdown reason terminate below
        alpha = tau / jnp.where(sigma == 0, jnp.ones((), dtype), sigma)
        s = c["r"] - alpha * v
        s2 = apply_pc(pc, s)
        t = A.mult(s2)
        # fused reduction 2: (s,s), (t,s), (t,t), (t,rp)
        xi1_l = jnp.sum(s * s)
        xi2_l = jnp.sum(t * s)
        xi3_l = jnp.sum(t * t)
        xi4_l = jnp.sum(t * rp)
        xi1, xi2, xi3, xi4 = ops.reduce_all(
            (xi1_l, xi2_l, xi3_l, xi4_l), axis)
        breakdown = (xi3 == 0) | (sigma == 0)
        omega = xi2 / jnp.where(xi3 == 0, jnp.ones((), dtype), xi3)
        beta = -xi4 / jnp.where(sigma == 0, jnp.ones((), dtype), sigma)
        dp = jnp.sqrt(jnp.abs(xi1 - omega * xi2)).real.astype(rnorm0.dtype)
        # on breakdown keep the previous iterate/residual — the
        # reference aborts before applying the update
        x = jnp.where(breakdown, c["x"],
                      c["x"] + alpha * p2 + omega * s2)
        its = its + 1
        dp = jnp.where(breakdown, c["history"][its - 1].astype(dp.dtype),
                       dp)
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where((reason == 0) & breakdown,
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN),
                           reason)
        r = jnp.where(breakdown, c["r"], s - omega * t)
        p = jnp.where(breakdown, c["p"],
                      r + beta * (c["p"] - omega * v))
        return dict(x=x, r=r, p=p, its=its, history=history,
                    reason=reason)

    init = dict(x=x, r=r, p=r, its=jnp.int32(0), history=history,
                reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])
