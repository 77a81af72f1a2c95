"""Additional nonlinear solvers: NEWTONTR, NGMRES (Anderson), QN.

Reference: src/snes/impls/tr (trust region), src/snes/impls/ngmres
(Anderson-type nonlinear GMRES), src/snes/impls/qn (L-BFGS).
All are single `lax.while_loop` programs with static-window histories.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from petsctpu.core.errors import SNESConvergedReason
from petsctpu.snes.api import SNESConfig, SNESResult, _check, _monitor
from petsctpu.vec import ops


def snes_newtontr(F: Callable, x0: jax.Array, cfg: SNESConfig = None,
                  axis: Optional[str] = None, delta0: float = 0.2,
                  delta_max: float = 1e10, eta: float = 1e-4,
                  cg_maxits: int = 50, cg_rtol: float = 1e-8,
                  **kw) -> SNESResult:
    """Gauss-Newton trust region with Steihaug-CG subproblem solves.

    Minimizes φ(x)=½‖F‖² with model Hessian JᵀJ (products via AD
    jvp/vjp); the CG iteration stops at the trust boundary or on
    negative curvature (impossible for JᵀJ but kept for generality) —
    the reference's NASH/STCG role (src/snes/impls/tr)."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    dtype = x0.dtype

    def phi(x):
        r = F(x)
        return 0.5 * ops.dot(r, r, axis).real, r

    def Hv(x, v):
        # JᵀJ v via jvp then vjp
        _, Jv = jax.jvp(F, (x,), (v,))
        return jax.vjp(F, x)[1](Jv)[0]

    def steihaug(x, g, delta):
        """min gᵀp + ½pᵀHp  s.t. ‖p‖≤Δ."""
        p0 = jnp.zeros_like(x)
        r0 = -g
        d0 = r0
        rr0 = ops.dot(r0, r0, axis).real

        def cond(c):
            return (~c["done"]) & (c["k"] < cg_maxits)

        def body(c):
            p, r, d, rr, k = c["p"], c["r"], c["d"], c["rr"], c["k"]
            Hd = Hv(x, d)
            dHd = ops.dot(d, Hd, axis).real
            alpha = rr / dHd
            p_new = p + alpha * d
            # hit the boundary → step to it
            pn = ops.norm(p_new, axis)
            over = pn >= delta
            # tau solving ‖p + τd‖ = Δ
            pd = ops.dot(p, d, axis).real
            dd = ops.dot(d, d, axis).real
            pp = ops.dot(p, p, axis).real
            disc = jnp.maximum(pd * pd - dd * (pp - delta * delta), 0.0)
            tau = (-pd + jnp.sqrt(disc)) / jnp.where(dd > 0, dd, 1.0)
            p_bd = p + tau * d
            neg_curv = dHd <= 0
            p_out = jnp.where(neg_curv | over, p_bd, p_new)
            r_new = r - alpha * Hd
            rr_new = ops.dot(r_new, r_new, axis).real
            done = neg_curv | over | (jnp.sqrt(rr_new)
                                      <= cg_rtol * jnp.sqrt(rr0))
            beta = rr_new / rr
            d_new = r_new + beta * d
            return dict(p=p_out, r=r_new, d=d_new, rr=rr_new, k=k + 1,
                        done=done)

        out = lax.while_loop(cond, body,
                             dict(p=p0, r=r0, d=d0, rr=rr0,
                                  k=jnp.int32(0), done=rr0 == 0))
        return out["p"]

    f0, r0 = phi(x0)
    fnorm = jnp.sqrt(2.0 * f0)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, its, delta = c["x"], c["its"], c["delta"]
        fval, r = phi(x)
        g = jax.vjp(F, x)[1](r)[0]          # ∇φ = JᵀF
        p = steihaug(x, g, delta)
        fnew, _ = phi(x + p)
        # model decrease: −gᵀp − ½pᵀHp
        pred = -(ops.dot(g, p, axis).real
                 + 0.5 * ops.dot(p, Hv(x, p), axis).real)
        ared = fval - fnew
        rho = ared / jnp.where(pred > 0, pred, 1e-30)
        accept = rho > eta
        x_new = jnp.where(accept, x + p, x)
        pn = ops.norm(p, axis)
        delta = jnp.where(rho < 0.25, 0.25 * delta,
                          jnp.where((rho > 0.75) & (pn >= 0.99 * delta),
                                    jnp.minimum(2.0 * delta, delta_max),
                                    delta))
        fn = jnp.sqrt(2.0 * jnp.where(accept, fnew, fval))
        its = its + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, pn, ops.norm(x_new, axis), its, cfg)
        reason = jnp.where((reason == 0) & (delta < 1e-14),
                           jnp.int32(SNESConvergedReason.DIVERGED_LINE_SEARCH),
                           reason)
        return dict(x=x_new, its=its, delta=delta, history=history,
                    reason=reason)

    out = lax.while_loop(cond, body,
                         dict(x=x0, its=jnp.int32(0),
                              delta=jnp.asarray(delta0, dtype),
                              history=history, reason=reason))
    fn_final = ops.norm(F(out["x"]), axis)
    return SNESResult(out["x"], out["its"], out["reason"], fn_final,
                      out["history"])


def snes_tr(F: Callable, x0: jax.Array, jac=None, pc_builder=None,
            ksp_cfg=None, cfg: SNESConfig = None,
            axis: Optional[str] = None, delta0: float = 0.2,
            delta1: float = 0.3, delta2: float = 0.75, delta3: float = 2.0,
            mu: float = 0.25, eta: float = 0.75, sigma: float = 1e-4,
            deltatol: float = 1e-12, max_shrinks: int = 30,
            **kw) -> SNESResult:
    """Reference-exact Newton trust region (src/snes/impls/tr/tr.c).

    Per outer iteration: ONE Krylov solve of J·Y = F (tr.c:166), then
    an inner shrink loop (tr.c:173-219): clip the step to the radius
    (if ‖Y‖ ≥ Δ scale by Δ/‖Y‖ with predicted norm gpnorm =
    (1−Δ/‖Y‖)·‖F‖, tr.c:178-185), evaluate the trial point, form
    ρ = (‖F‖²−‖G‖²)/(‖F‖²−gpnorm²) (tr.c:195-196), update
    Δ ← Δ·{delta1|delta2|delta3} on ρ < mu / < eta / else
    (tr.c:199-201), accept when ρ > sigma (tr.c:205). Initial
    Δ = delta0·‖F(x0)‖ (tr.c:134). Constants are tr.c:369-376
    defaults. Converges CONVERGED_TR_DELTA when Δ < ‖x‖·deltatol
    (tr.c:67-68)."""
    from petsctpu.ksp.api import KSP_REGISTRY
    from petsctpu.ksp.common import KSPConfig
    from petsctpu.snes.fdjac import ColoredJacobian, jvp_operator, \
        mffd_operator

    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    ksp_cfg = ksp_cfg or KSPConfig(ksp_type="gmres", rtol=1e-5, maxits=200)
    jac = jac or cfg.jac
    ksolver = KSP_REGISTRY[ksp_cfg.ksp_type]
    dtype = x0.dtype

    def build_J(x, Fx):
        if jac == "jvp":
            return jvp_operator(F, x, Fx)
        if jac == "fd":
            return mffd_operator(F, x, Fx)
        if isinstance(jac, ColoredJacobian):
            return jac.assemble(F, x, Fx)
        return jac(x, Fx)

    x = x0
    Fx = F(x)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    delta = delta0 * fnorm                               # tr.c:134
    history = jnp.full((cfg.maxits + 1,), jnp.nan, dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), dtype),
                    ops.norm(x, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, Fx, fnorm, its, delta = (c["x"], c["F"], c["fnorm"], c["its"],
                                    c["delta"])
        J = build_J(x, Fx)
        pc = pc_builder(J) if pc_builder is not None else None
        kres = ksolver(J, Fx, jnp.zeros_like(x), pc, ksp_cfg, axis)
        Ytmp = kres.x
        nrm0 = ops.norm(Ytmp, axis)

        def icond(ic):
            return (~ic["accepted"]) & (ic["tries"] < max_shrinks) \
                & ~ic["hopeless"]

        def ibody(ic):
            d = ic["delta"]
            over = nrm0 >= d
            s = jnp.where(over, d / jnp.maximum(nrm0, 1e-300), 1.0)
            Y = s * Ytmp
            gpnorm = jnp.where(over, (1.0 - s) * fnorm, 0.0)
            ynorm = jnp.where(over, d, nrm0)
            Xt = x - Y                                   # tr.c:191 X − Y
            G = F(Xt)
            gnorm = ops.norm(G, axis)
            denom = fnorm * fnorm - gpnorm * gpnorm
            rho = jnp.where(fnorm == gpnorm, 0.0,
                            (fnorm * fnorm - gnorm * gnorm)
                            / jnp.where(denom != 0, denom, 1.0))
            d_new = d * jnp.where(rho < mu, delta1,
                                  jnp.where(rho < eta, delta2, delta3))
            accepted = rho > sigma
            hopeless = d_new < ops.norm(x, axis) * deltatol
            return dict(delta=d_new, Xt=Xt, G=G, gnorm=gnorm, ynorm=ynorm,
                        accepted=accepted, hopeless=hopeless,
                        tries=ic["tries"] + 1)

        ic0 = dict(delta=delta, Xt=x, G=Fx, gnorm=fnorm,
                   ynorm=jnp.zeros((), dtype), accepted=jnp.asarray(False),
                   hopeless=jnp.asarray(False), tries=jnp.int32(0))
        ic = lax.while_loop(icond, ibody, ic0)
        acc = ic["accepted"]
        xn = jnp.where(acc, ic["Xt"], x)
        Fn = jnp.where(acc, ic["G"], Fx)
        fn = jnp.where(acc, ic["gnorm"], fnorm)
        its = its + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ic["ynorm"], ops.norm(xn, axis), its,
                        cfg)
        reason = jnp.where(
            (reason == 0) & ~acc,
            jnp.int32(SNESConvergedReason.CONVERGED_TR_DELTA), reason)
        reason = jnp.where((reason == 0) & (kres.reason < 0),
                           jnp.int32(SNESConvergedReason.DIVERGED_LINEAR_SOLVE),
                           reason)
        return dict(x=xn, F=Fn, fnorm=fn, its=its, delta=ic["delta"],
                    history=history, reason=reason)

    out = lax.while_loop(cond, body,
                         dict(x=x, F=Fx, fnorm=fnorm, its=jnp.int32(0),
                              delta=delta, history=history, reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"], out["fnorm"],
                      out["history"])


def snes_anderson(F: Callable, x0: jax.Array, window: int = 5,
                  beta: float = 1.0, cfg: SNESConfig = None,
                  axis: Optional[str] = None,
                  npc: Optional[Callable] = None, **kw) -> SNESResult:
    """Anderson mixing / nonlinear GMRES (src/snes/impls/ngmres).

    Keeps a window of (x, F) pairs; each step solves the small
    least-squares problem min‖F_k + Σαᵢ(Fᵢ−F_k)‖ and combines.

    npc: optional nonlinear preconditioner x → x' (an inner-solver
    application — the reference's snes->pc, e.g. a few NGS sweeps or
    one FAS cycle); the accelerated point is passed through it each
    iteration (right-preconditioned NGMRES)."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    dtype = x0.dtype
    n = x0.shape[0]
    w = window

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, Fx, its = c["x"], c["F"], c["its"]
        Xh, Fh = c["Xh"], c["Fh"]
        k = jnp.minimum(its, w)
        slot = its % w
        Xh = Xh.at[slot].set(x)
        Fh = Fh.at[slot].set(Fx)
        # differences vs current: solve min ‖Fx − D α‖, D = Fx − Fᵢ
        valid = (jnp.arange(w) < k) & (jnp.arange(w) != slot) | \
            ((jnp.arange(w) == slot) & (k == w))
        D = Fx[None, :] - Fh                      # [w, n]
        Dm = jnp.where(valid[:, None], D, 0.0)
        # small Gram system; under SPMD the contractions psum globally
        G_l = Dm @ Dm.T
        rhs_l = Dm @ Fx
        if axis is not None:
            G_l = lax.psum(G_l, axis)
            rhs_l = lax.psum(rhs_l, axis)
        G = G_l + 1e-12 * jnp.eye(w, dtype=dtype)
        alpha = jnp.linalg.solve(G, rhs_l)
        alpha = jnp.where(valid, alpha, 0.0)
        x_mix = x + (Xh - x[None, :]).T @ alpha
        F_mix = Fx - Dm.T @ alpha
        x_new = x_mix - beta * F_mix
        if npc is not None:
            x_new = npc(x_new)
        Fn = F(x_new)
        fn = ops.norm(Fn, axis)
        its = its + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(x_new - x, axis),
                        ops.norm(x_new, axis), its, cfg)
        return dict(x=x_new, F=Fn, its=its, Xh=Xh, Fh=Fh,
                    history=history, reason=reason)

    init = dict(x=x0, F=Fx, its=jnp.int32(0),
                Xh=jnp.zeros((w, n), dtype), Fh=jnp.zeros((w, n), dtype),
                history=history, reason=reason)
    out = lax.while_loop(cond, body, init)
    return SNESResult(out["x"], out["its"], out["reason"],
                      ops.norm(F(out["x"]), axis), out["history"])


def snes_qn(F: Callable, x0: jax.Array, history_len: int = 10,
            cfg: SNESConfig = None, axis: Optional[str] = None,
            scale_type: str = "shanno", restart_type: str = "powell",
            powell_gamma: float = 0.9999, **kw) -> SNESResult:
    """L-BFGS quasi-Newton on F — the reference's SNESQN verbatim
    (src/snes/impls/qn/qn.c SNESQNApply_LBFGS + SNESSolve_QN):
    secant pairs (dX, dF) from successive iterates, two-loop recursion
    with SHANNO initial scaling γ = dX·dF/dF·dF from the latest pair,
    POWELL-criterion restarts (|Dold·D| > 0.9999·|Dold·Dold|), and the
    CP line search (one linear-order secant step), all defaults of
    qn.c:762-773."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    dtype = x0.dtype
    n = x0.shape[0]
    m = history_len

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def lbfgs_apply(i_r, D, Dold, X, Xold, dX, dF, dXtdF, scaling):
        l = jnp.minimum(i_r, m)
        k_new = (i_r - 1) % m

        def with_pair(_):
            dFk = D - Dold
            dXk = X - Xold
            dXtdFk = ops.dot(dXk, dFk, axis)
            sc = (dXtdFk / ops.dot(dFk, dFk, axis)
                  if scale_type == "shanno" else scaling)
            return (dX.at[k_new].set(dXk), dF.at[k_new].set(dFk),
                    dXtdF.at[k_new].set(dXtdFk),
                    sc if scale_type == "shanno" else scaling)

        dX, dF, dXtdF, scaling = lax.cond(
            i_r > 0, with_pair, lambda _: (dX, dF, dXtdF, scaling), None)

        Y = D
        alpha = jnp.zeros(m, dtype)

        def bwd(i2, carry):
            Y, alpha = carry
            k = (i_r - i2 - 1) % m
            a = ops.dot(dX[k], Y, axis) / dXtdF[k]
            a = jnp.where(i2 < l, a, 0.0)
            return (Y - a * dF[k], alpha.at[k].set(a))

        Y, alpha = lax.fori_loop(0, m, bwd, (Y, alpha))
        Y = Y * scaling

        def fwd(i2, Y):
            k = (i_r - l + i2) % m
            b = ops.dot(dF[k], Y, axis) / dXtdF[k]
            upd = (alpha[k] - b) * dX[k]
            return Y + jnp.where(i2 < l, 1.0, 0.0) * upd

        Y = lax.fori_loop(0, m, fwd, Y)
        return Y, dX, dF, dXtdF, scaling

    from petsctpu.snes.api import _linesearch_cp

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, Fx, D, Dold, Xold = c["x"], c["F"], c["D"], c["Dold"], c["Xold"]
        Y, dX, dF, dXtdF, scaling = lbfgs_apply(
            c["i_r"], D, Dold, x, Xold, c["dX"], c["dF"], c["dXtdF"],
            c["scaling"])
        Dold, Xold = D, x
        xn, Fn, fn, lam, ls_ok = _linesearch_cp(F, x, Y, Fx, axis)
        its = c["its"] + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(xn - x, axis),
                        ops.norm(xn, axis), its, cfg)
        D = Fn
        # Powell restart: history discarded when the new direction is
        # insufficiently different from the old (qn.c:462-473)
        powell = jnp.abs(ops.dot(Dold, D, axis)) >             powell_gamma * jnp.abs(ops.dot(Dold, Dold, axis))
        i_r = jnp.where((restart_type == "powell") & powell,
                        jnp.int32(0), c["i_r"] + 1)
        return dict(x=xn, F=Fn, fnorm=fn, its=its, i_r=i_r, D=D,
                    Dold=Dold, Xold=Xold, dX=dX, dF=dF, dXtdF=dXtdF,
                    scaling=scaling, history=history, reason=reason)

    init = dict(x=x0, F=Fx, fnorm=fnorm, its=jnp.int32(0),
                i_r=jnp.int32(0), D=Fx, Dold=jnp.zeros_like(x0),
                Xold=jnp.zeros_like(x0),
                dX=jnp.zeros((m, n), dtype), dF=jnp.zeros((m, n), dtype),
                dXtdF=jnp.ones(m, dtype),
                scaling=jnp.ones((), dtype), history=history,
                reason=reason)
    out = lax.while_loop(cond, body, init)
    return SNESResult(out["x"], out["its"], out["reason"], out["fnorm"],
                      out["history"])


def snes_ngmres(F: Callable, x0: jax.Array, msize: int = 30,
                cfg: SNESConfig = None, axis: Optional[str] = None,
                gammaA: float = 2.0, gammaC: float = 2.0,
                epsilonB: float = 0.1, deltaB: float = 0.9,
                restart_it: int = 2, npc: Optional[Callable] = None,
                **kw) -> SNESResult:
    """SNESNGMRES verbatim (src/snes/impls/ngmres/snesngmres.c):
    each iteration takes an L2-line-search Richardson step to (XM, FM),
    minimizes ‖FM − Σβ(FM − F_i)‖ over the stored subspace via the
    Gram matrix (H β = ν − ξ), forms the accelerated XA, then applies
    the DIFFERENCE selection (gammaA/epsilonB/deltaB) and DIFFERENCE
    restart (gammaC, restart_it=2) criteria with the reference's
    default constants (snesngmres.c:726-742)."""
    from petsctpu.snes.api import _linesearch_l2

    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    dtype = x0.dtype
    n = x0.shape[0]
    m = msize

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    Xdot0 = jnp.zeros((m, n), dtype).at[0].set(x0)
    Fdot0 = jnp.zeros((m, n), dtype).at[0].set(Fx)
    Q0 = jnp.zeros((m, m), dtype).at[0, 0].set(fnorm * fnorm)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        X, Fc, fnorm = c["x"], c["F"], c["fnorm"]
        l, k_restart = c["l"], c["k_restart"]
        Xdot, Fdot, Q = c["Xdot"], c["Fdot"], c["Q"]
        fminnorm = c["fminnorm"]
        ivec = k_restart % m

        if npc is not None:
            # right nonlinear preconditioning (snesngmres.c:254-266):
            # XM = one inner npc solve from X; FM = F at its iterate
            XM = npc(X)
            FM = F(XM)
            fMnorm = ops.norm(FM, axis)
        else:
            # Richardson step with the L2 line search → (XM, FM)
            XM, FM, fMnorm, _, _ = _linesearch_l2(F, X, Fc, fnorm, axis)
        nu = fMnorm * fMnorm
        fminnorm = jnp.minimum(fminnorm, fMnorm)

        mask = (jnp.arange(m) < l).astype(dtype)
        xi = (Fdot @ FM) * mask
        rhs = (nu - xi) * mask
        H = (Q - xi[:, None] - xi[None, :] + nu) * \
            (mask[:, None] * mask[None, :])
        # inactive slots → p·I with p = max|H_active| so the padded
        # block-diagonal matrix has the SAME σmax as the active l×l
        # block (σmax ≥ max|h_ij| always); then an SVD solve with
        # LAPACK gelss's rcond rule (σ ≤ eps·σmax treated as zero,
        # rcond=-1 → machine precision, snesngmres.c:315) reproduces
        # the reference's least-squares β exactly — this matters once
        # H goes numerically singular (stagnating subspaces), where a
        # keep-all-σ solve diverges from gelss in the 4th digit.
        pad = jnp.maximum(jnp.max(jnp.abs(H)), 1.0e-300)
        H = H + pad * jnp.diag(1.0 - mask)
        U, S, Vt = jnp.linalg.svd(H, full_matrices=False)
        eps = jnp.finfo(dtype).eps
        cut = eps * S[0]
        Sinv = jnp.where(S > cut, 1.0 / jnp.where(S > cut, S, 1.0), 0.0)
        beta = (Vt.T @ (Sinv * (U.T @ rhs))) * mask
        alph_total = jnp.sum(beta)
        XA = (1.0 - alph_total) * XM + beta @ Xdot
        FA = F(XA)
        fAnorm = ops.norm(FA, axis)

        dnorm = ops.norm(XA - XM, axis)
        dall = jnp.sqrt(jnp.sum((Xdot - XA[None, :]) ** 2, axis=1))
        dminnorm = jnp.min(jnp.where(mask > 0, dall, jnp.inf))

        # DIFFERENCE selection (snesngmres.c:440-470)
        selectA = (fAnorm < gammaA * fminnorm) & \
            ((epsilonB * dnorm < dminnorm)
             | (jnp.sqrt(fnorm) < deltaB * jnp.sqrt(fminnorm)))
        Xn = jnp.where(selectA, XA, XM)
        Fn = jnp.where(selectA, FA, FM)
        fn = jnp.where(selectA, fAnorm, fMnorm)

        # DIFFERENCE restart (snesngmres.c:480-500)
        bad = ((epsilonB * dnorm > dminnorm)
               & (jnp.sqrt(fAnorm) > deltaB * jnp.sqrt(fminnorm))) \
            | (jnp.sqrt(fAnorm) > gammaC * jnp.sqrt(fminnorm))
        restart_count = jnp.where(bad, c["restart_count"] + 1, 0)
        do_restart = restart_count >= restart_it

        # restart: subspace ← {(Xn, Fn)}; else append at ivec
        l_new = jnp.where(do_restart, 1, jnp.minimum(l + 1, m))
        k_new = jnp.where(do_restart, 1, k_restart + 1)
        restart_count = jnp.where(do_restart, 0, restart_count)
        fminnorm = jnp.minimum(fminnorm, fn)

        def restarted(_):
            Xd = jnp.zeros_like(Xdot).at[0].set(Xn)
            Fd = jnp.zeros_like(Fdot).at[0].set(Fn)
            Qn = jnp.zeros_like(Q).at[0, 0].set(fn * fn)
            return Xd, Fd, Qn

        def appended(_):
            Xd = Xdot.at[ivec].set(Xn)
            Fd = Fdot.at[ivec].set(Fn)
            mask2 = (jnp.arange(m) < jnp.minimum(l + 1, m)).astype(dtype)
            xi2 = (Fd @ Fn) * mask2
            Qn = Q.at[:, ivec].set(xi2).at[ivec, :].set(xi2)
            return Xd, Fd, Qn

        Xdot, Fdot, Q = lax.cond(do_restart, restarted, appended, None)

        its = c["its"] + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(Xn - X, axis),
                        ops.norm(Xn, axis), its, cfg)
        return dict(x=Xn, F=Fn, fnorm=fn, its=its, l=l_new,
                    k_restart=k_new, restart_count=restart_count,
                    fminnorm=fminnorm, Xdot=Xdot, Fdot=Fdot, Q=Q,
                    history=history, reason=reason)

    init = dict(x=x0, F=Fx, fnorm=fnorm, its=jnp.int32(0),
                l=jnp.int32(1), k_restart=jnp.int32(1),
                restart_count=jnp.int32(0), fminnorm=fnorm,
                Xdot=Xdot0, Fdot=Fdot0, Q=Q0, history=history,
                reason=reason)
    out = lax.while_loop(cond, body, init)
    return SNESResult(out["x"], out["its"], out["reason"], out["fnorm"],
                      out["history"])
