"""BiCGStab and friends (nonsymmetric Krylov).

Reference: KSPSolve_BCGS (src/ksp/ksp/impls/bcgs/bcgs.c) — left-
preconditioned BiCGStab on M⁻¹A with rho/omega breakdown detection;
plus CGS and BiCG siblings (src/ksp/ksp/impls/{cgs,bicg}).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from petsctpu.core.errors import ConvergedReason
from petsctpu.ksp.common import (
    KSPConfig, SolveResult, NORM_NONE, NORM_PRECONDITIONED, apply_pc,
    check_convergence, init_history, monitor_cb, record,
)
from petsctpu.vec import ops


def _op(A, pc, v):
    """Preconditioned operator M⁻¹A v (left)."""
    return apply_pc(pc, A.mult(v))


def solve_bcgs(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = apply_pc(pc, b - A.mult(x)) if cfg.guess_nonzero else apply_pc(pc, b)
    rt = r                                    # shadow residual r̃₀
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
        v = _op(A, pc, p)
        rtv = ops.dot(c["rt"], v, axis)
        alpha = rho / rtv
        s = c["r"] - alpha * v
        t = _op(A, pc, s)
        # fuse the two omega reductions
        tt_l = jnp.vdot(t, t).real
        ts_l = jnp.vdot(t, s)
        tt, ts = ops.reduce_all((tt_l, ts_l), axis)
        omega = ts / jnp.where(tt > 0, tt, 1.0)
        x = c["x"] + alpha * p + omega * s
        r = s - omega * t
        dp = ops.norm(r, axis)
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        breakdown = (rho == 0) | (rtv == 0) | (omega == 0)
        reason = jnp.where((reason == 0) & breakdown,
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN), reason)
        return dict(x=x, r=r, rt=c["rt"], p=p, v=v, rho_old=rho, alpha=alpha,
                    omega=omega, its=its, history=history, reason=reason)

    init = dict(x=x, r=r, rt=rt, p=zero, v=zero,
                rho_old=jnp.ones((), dtype), alpha=jnp.ones((), dtype),
                omega=jnp.ones((), dtype), its=jnp.int32(0),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_cgsq(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Conjugate Gradient Squared (src/ksp/ksp/impls/cgs)."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r = apply_pc(pc, b - A.mult(x)) if cfg.guess_nonzero else apply_pc(pc, b)
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
        beta = jnp.where(first, 0.0, rho / c["rho_old"])
        u = c["r"] + beta * c["q"]
        p = u + beta * (c["q"] + beta * c["p"])
        v = _op(A, pc, p)
        sigma = ops.dot(c["rt"], v, axis)
        alpha = rho / sigma
        q = u - alpha * v
        uq = u + q
        x = c["x"] + alpha * uq
        r = c["r"] - alpha * _op(A, pc, uq)
        dp = ops.norm(r, axis)
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        breakdown = (rho == 0) | (sigma == 0)
        reason = jnp.where((reason == 0) & breakdown,
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN), reason)
        return dict(x=x, r=r, rt=c["rt"], p=p, q=q, rho_old=rho, its=its,
                    history=history, reason=reason)

    init = dict(x=x, r=r, rt=rt, p=zero, q=zero, rho_old=jnp.ones((), dtype),
                its=jnp.int32(0), history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_bicg(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """BiCG (src/ksp/ksp/impls/bicg/bicg.c, complex-correct): left
    vectors run through the HERMITIAN adjoint (the reference's
    VecConjugate sandwich around MatMultTranspose/PCApplyTranspose,
    bicg.c:90-93). PCs exposing `apply_transpose` (ILUPCT via
    -pc_factor_transpose_solves, the PCApplyTranspose analog) get the
    TRUE adjoint; symmetric PCs fall back to the conjugate sandwich
    M⁻ᴴ v = conj(M⁻¹ conj(v))."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    rr = b - A.mult(x) if cfg.guess_nonzero else b
    rl = rr

    # a PC "has a true transpose" only when the whole wrapper chain
    # does (PermutedPC always defines apply_transpose but its inner
    # may not — has_transpose reports the chain's capability)
    def pc_herm(v):
        if getattr(pc, "has_transpose", hasattr(pc, "apply_transpose")):
            return jnp.conj(pc.apply_transpose(jnp.conj(v)))
        return jnp.conj(apply_pc(pc, jnp.conj(v)))

    def mult_herm(v):
        return jnp.conj(A.multT(jnp.conj(v)))

    zr = apply_pc(pc, rr)
    zl = pc_herm(rl)
    dp = ops.norm(zr, axis)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp
    zero = jnp.zeros_like(b)

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"]
        # VecDot(Zr, Rl) = conj(Rl)·Zr
        beta = ops.dot(c["rl"], c["zr"], axis)
        first = its == 0
        bfac = jnp.where(first, 0.0, beta / c["beta_old"])
        pr = c["zr"] + bfac * c["pr"]
        pl = c["zl"] + jnp.conj(bfac) * c["pl"]
        vzr = A.mult(pr)
        vzl = mult_herm(pl)
        dpi = ops.dot(pl, vzr, axis)              # VecDot(Zr, Pl)
        a = beta / dpi
        x = c["x"] + a * pr
        rr = c["rr"] - a * vzr
        rl = c["rl"] - jnp.conj(a) * vzl
        zr = apply_pc(pc, rr)
        zl = pc_herm(rl)
        dp = ops.norm(zr, axis)
        its = its + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where((reason == 0) & ((beta == 0) | (dpi == 0)),
                           jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN),
                           reason)
        return dict(x=x, rr=rr, rl=rl, zr=zr, zl=zl, pr=pr, pl=pl,
                    beta_old=beta, its=its, history=history,
                    reason=reason)

    init = dict(x=x, rr=rr, rl=rl, zr=zr, zl=zl, pr=zero, pl=zero,
                beta_old=jnp.ones((), dtype), its=jnp.int32(0),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])
