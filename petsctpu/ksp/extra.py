"""Additional Krylov methods: CR, TFQMR, CGNE, FBCGS.

Reference: src/ksp/ksp/impls/{cr,tfqmr,cgne,bcgs/fbcgs}.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from petsctpu.core.errors import ConvergedReason
from petsctpu.ksp.common import (
    KSPConfig, SolveResult, apply_pc, check_convergence, init_history,
    monitor_cb, record,
)
from petsctpu.vec import ops


def solve_cr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Preconditioned conjugate residuals, reference-exact recurrence
    (KSPSolve_CR cr.c): RT is the preconditioned residual, the step is
    ai = (RT, A·RT)/(AP, M⁻¹AP), P/AP update with bi = btop/bbot, and
    the default norm is ‖RT‖. (Note: NOT CR on the symmetrically
    preconditioned operator — the two only coincide for M = cI.)"""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = b - A.mult(x) if cfg.guess_nonzero else b
    rt = apply_pc(pc, r0)
    p = rt
    ap = A.mult(p)
    art = ap
    # VecDot(RT,ART) = sum RT conj(ART); the reference's indefinite-
    # matrix test (|btop| < 0, cr.c) is dead code — reproduced by NOT
    # checking, so indefinite systems iterate exactly like cr.c does
    btop_l = jnp.vdot(art, rt)
    nrm_l = jnp.vdot(rt, rt).real
    btop, nrm2 = ops.reduce_all((btop_l, nrm_l), axis)
    dp = jnp.sqrt(nrm2)
    history = record(init_history(cfg, dtype), 0, dp)
    monitor_cb(cfg, 0, dp)
    reason = check_convergence(dp, dp, jnp.int32(0), cfg)
    rnorm0 = dp

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        q = apply_pc(pc, c["ap"])
        apq = ops.dot(q, c["ap"], axis)        # VecDot(AP,Q)
        bad_pc = apq.real <= 0
        ai = c["btop"] / jnp.where(bad_pc, jnp.ones((), dtype), apq)
        x = c["x"] + ai * c["p"]
        rt = c["rt"] - ai * q
        art = A.mult(rt)
        btop_l = jnp.vdot(art, rt)
        nrm_l = jnp.vdot(rt, rt).real
        btop, nrm2 = ops.reduce_all((btop_l, nrm_l), axis)
        dp = jnp.sqrt(nrm2)
        its = c["its"] + 1
        history = record(c["history"], its, dp)
        monitor_cb(cfg, its, dp)
        reason = check_convergence(dp, rnorm0, its, cfg)
        reason = jnp.where(
            (reason == 0) & bad_pc,
            jnp.int32(ConvergedReason.DIVERGED_INDEFINITE_PC), reason)
        bi = btop / jnp.where(c["btop"] == 0, jnp.ones((), dtype),
                              c["btop"])
        p = rt + bi * c["p"]
        ap = art + bi * c["ap"]
        return dict(x=x, rt=rt, p=p, ap=ap, btop=btop, its=its,
                    history=history, reason=reason)

    init = dict(x=x, rt=rt, p=p, ap=ap, btop=btop, its=jnp.int32(0),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["its"]], out["history"])


def solve_tfqmr(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """Transpose-free QMR, reference-exact (KSPSolve_TFQMR tfqmr.c):
    each outer iteration performs TWO QMR half-step updates with
    w = sqrt(dp·dpold) then w = dp, monitors dpest = sqrt(m+1)·tau at
    BOTH half-steps (labelled i+1 — the stream carries two entries per
    iteration), and tests convergence on each. `its` counts outer
    iterations; `history` holds the monitor stream (2 per iteration)."""
    dtype = b.dtype
    x = x0 if cfg.guess_nonzero else jnp.zeros_like(b)
    r0 = apply_pc(pc, b - A.mult(x)) if cfg.guess_nonzero else apply_pc(pc, b)

    def B(v):
        return apply_pc(pc, A.mult(v))

    dp0 = ops.norm(r0, axis)
    rdtype = dp0.dtype
    history = jnp.full((2 * cfg.maxits + 3,), jnp.nan, dtype=rdtype)
    history = record(history, 0, dp0)
    monitor_cb(cfg, 0, dp0)
    reason = check_convergence(dp0, dp0, jnp.int32(0), cfg)
    rnorm0 = dp0
    rp = r0
    rhoold = ops.dot(rp, r0, axis)             # VecDot(R,RP)
    v0 = B(r0)
    zero = jnp.zeros_like(b)

    def cond(c):
        return c["reason"] == ConvergedReason.ITERATING

    def body(c):
        its = c["its"] + 1
        s = ops.dot(rp, c["v"], axis)          # VecDot(V,RP)
        a = c["rhoold"] / jnp.where(s == 0, jnp.ones((), dtype), s)
        q = c["u"] - a * c["v"]
        t = c["u"] + q
        auq = B(t)
        r = c["r"] - a * auq
        dp = ops.norm(r, axis)

        tau, etaold, psiold = c["tau"], c["etaold"], c["psiold"]
        d, x = c["d"], c["x"]
        history, reason, hidx = c["history"], c["reason"], c["hidx"]
        for m in (0, 1):
            w = jnp.sqrt(dp * c["dpold"]) if m == 0 else dp
            psi = w / tau
            cm = 1.0 / jnp.sqrt(1.0 + psi * psi)
            tau = tau * psi * cm
            eta = (cm * cm) * a
            cfac = psiold * psiold * etaold \
                / jnp.where(a == 0, jnp.ones((), dtype), a)
            d = (c["u"] if m == 0 else q) + cfac * d
            live = reason == ConvergedReason.ITERATING
            x = jnp.where(live, x + eta * d, x)
            dpest = ((m + 1.0) ** 0.5) * tau
            hidx = jnp.where(live, hidx + 1, hidx)
            history = jnp.where(
                live, history.at[hidx].set(dpest), history)
            monitor_cb(cfg, its, dpest)
            new_reason = check_convergence(dpest, rnorm0, its, cfg)
            reason = jnp.where(live, new_reason, reason)
            etaold = jnp.where(live, eta, etaold)
            psiold = jnp.where(live, psi, psiold)

        rho = ops.dot(rp, r, axis)             # VecDot(R,RP)
        bb = rho / jnp.where(c["rhoold"] == 0, jnp.ones((), dtype),
                             c["rhoold"])
        u = r + bb * q
        q2 = q + bb * c["p"]
        p = u + bb * q2
        v = B(p)
        reason = jnp.where(
            (reason == 0) & ((rho == 0) | (s == 0)),
            jnp.int32(ConvergedReason.DIVERGED_BREAKDOWN), reason)
        return dict(x=x, r=r, u=u, p=p, q=q, d=d, v=v, rhoold=rho,
                    tau=tau, etaold=etaold, psiold=psiold, dpold=dp,
                    its=its, hidx=hidx, history=history, reason=reason)

    one = jnp.ones((), dtype)
    init = dict(x=x, r=r0, u=r0, p=r0, q=zero, d=zero, v=v0,
                rhoold=rhoold, tau=dp0,
                etaold=jnp.zeros((), dtype), psiold=jnp.zeros((), rdtype),
                dpold=dp0, its=jnp.int32(0), hidx=jnp.int32(0),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SolveResult(out["x"], out["its"], out["reason"],
                       out["history"][out["hidx"]], out["history"])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _SquaredPC:
    """CGNE's preconditioner: Z = M⁻ᵀ(M⁻¹ r) (cgne.c:96-100 — the PC
    for AᵀA is applied twice, transposed second when available)."""

    pc: object

    def apply(self, r):
        t = self.pc.apply(r)
        if hasattr(self.pc, "apply_transpose"):
            return self.pc.apply_transpose(t)
        return self.pc.apply(t)


def solve_cgne(A, b, x0, pc, cfg: KSPConfig, axis=None) -> SolveResult:
    """CG on the normal equations AᵀA x = Aᵀ b (cgne.c): the residual
    is r = Aᵀ(b − Ax), the PC is applied twice (M⁻ᵀM⁻¹), and the
    default monitored norm is ‖M⁻ᵀM⁻¹r‖."""
    from petsctpu.ksp.cg import solve_cg
    from petsctpu.mat.base import Normal

    bt = A.multT(b)
    return solve_cg(Normal(A), bt, x0,
                    None if pc is None else _SquaredPC(pc), cfg, axis)


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
