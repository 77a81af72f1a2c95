"""SNES — Newton-Krylov nonlinear solver.

Reference: SNESSolve (src/snes/interface/snes.c:3585), Newton line
search SNESSolve_NEWTONLS (src/snes/impls/ls/ls.c:191-271), pluggable
line searches (src/snes/linesearch/impls/{basic,bt,l2,cp}), convergence
SNESDefaultConverged. The whole Newton loop — Jacobian build, inner
Krylov solve, line search — is ONE `lax.while_loop` program: the inner
KSP's while_loop nests inside, so a full nonlinear solve is a single
XLA computation with no host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from petsctpu.core.errors import SNESConvergedReason
from petsctpu.ksp.api import KSP_REGISTRY
from petsctpu.ksp.common import KSPConfig
from petsctpu.snes.fdjac import ColoredJacobian, jvp_operator, mffd_operator
from petsctpu.vec import ops


@dataclass(frozen=True)
class SNESConfig:
    rtol: float = 1e-8
    atol: float = 1e-50
    stol: float = 1e-8
    maxits: int = 50
    linesearch: str = "bt"            # bt | basic | l2 | cp
    ls_alpha: float = 1e-4
    ls_maxits: int = 40
    ls_it: int = 1                    # l2/cp refinement iterations
                                      # (SNESLineSearch max_its
                                      # default, linesearch.c:63)
    ls_lambda_min: float = 1e-12
    ls_order: str = "cubic"           # bt model: cubic | quadratic
                                      # (-snes_linesearch_order,
                                      # linesearchbt.c default cubic)
    monitor: bool = False
    jac: str = "jvp"                  # jvp | fd (when no explicit jac given)


class SNESResult(NamedTuple):
    x: jax.Array
    its: jax.Array
    reason: jax.Array
    fnorm: jax.Array
    history: jax.Array

    @property
    def converged(self):
        return int(self.reason) > 0


def _monitor(cfg, its, fnorm):
    if cfg.monitor:
        jax.debug.callback(
            lambda i, f: print(f"{int(i):3d} SNES Function norm {float(f):g} "),
            its, fnorm, ordered=True)


def _check(fnorm, fnorm0, snorm, xnorm, its, cfg: SNESConfig):
    R = SNESConvergedReason
    reason = jnp.where(
        jnp.isnan(fnorm), R.DIVERGED_FNORM_NAN,
        jnp.where(
            fnorm < cfg.atol, R.CONVERGED_FNORM_ABS,
            jnp.where(
                fnorm <= cfg.rtol * fnorm0, R.CONVERGED_FNORM_RELATIVE,
                jnp.where(
                    # snesut.c:30: strict snorm < stol*xnorm (NO floor
                    # on xnorm — with xnorm=snorm=0, as FAS passes
                    # per fas.c:824, this must NOT fire)
                    (its > 0) & (snorm < cfg.stol * xnorm),
                    R.CONVERGED_SNORM_RELATIVE,
                    jnp.where(its >= cfg.maxits, R.DIVERGED_MAX_IT,
                              R.ITERATING)))))
    return reason.astype(jnp.int32)


def _linesearch_bt(F, x, dx, Fx, fnorm, cfg: SNESConfig, axis):
    """Backtracking line search (linesearchbt.c): minimize
    φ(λ)=½‖F(x−λdx)‖², slope ≈ −‖F‖² for an (in)exact Newton step.
    The first backtrack uses the quadratic model; with
    ls_order="cubic" (the reference default -snes_linesearch_order)
    subsequent backtracks fit the Dennis-Schnabel cubic through the
    last two trial points. Steps clamped to [0.1λ, 0.5λ]."""
    phi0 = 0.5 * fnorm * fnorm
    slope = -fnorm * fnorm
    cubic = cfg.ls_order == "cubic"

    def cond(c):
        lam, lam_prev, phi, phi_prev, k, done = c
        return (~done) & (k < cfg.ls_maxits)

    def body(c):
        lam, lam_prev, phi, phi_prev, k, done = c
        xn = x - lam * dx
        fn = ops.norm(F(xn), axis)
        phin = 0.5 * fn * fn
        ok = phin <= phi0 + cfg.ls_alpha * lam * slope
        # quadratic backtrack
        denom = 2.0 * (phin - phi0 - lam * slope)
        lam_q = jnp.where(denom > 0, -slope * lam * lam / denom, 0.5 * lam)
        if cubic:
            # Dennis-Schnabel cubic through (lam, phin), (lam_prev,
            # phi_prev) — used from the second backtrack on
            d1 = phin - phi0 - lam * slope
            d2 = phi_prev - phi0 - lam_prev * slope
            dl = lam - lam_prev
            safe = jnp.abs(dl) > 1e-30
            dl = jnp.where(safe, dl, 1.0)
            a = (d1 / (lam * lam) - d2 / (lam_prev * lam_prev)) / dl
            bq = (-lam_prev * d1 / (lam * lam)
                  + lam * d2 / (lam_prev * lam_prev)) / dl
            disc = jnp.maximum(bq * bq - 3.0 * a * slope, 0.0)
            lam_c = jnp.where(jnp.abs(a) > 1e-30,
                              (-bq + jnp.sqrt(disc)) / (3.0 * a),
                              jnp.where(jnp.abs(bq) > 1e-30,
                                        -slope / (2.0 * bq), 0.5 * lam))
            lam_t = jnp.where(safe & (k > 0), lam_c, lam_q)
        else:
            lam_t = lam_q
        lam_new = jnp.clip(lam_t, 0.1 * lam, 0.5 * lam)
        return (jnp.where(ok, lam, lam_new), jnp.where(ok, lam_prev, lam),
                phin, jnp.where(ok, phi_prev, phin), k + 1,
                done | ok | (lam_new < cfg.ls_lambda_min))

    one = jnp.asarray(1.0, x.dtype)
    lam, _, phin, _, k, done = lax.while_loop(
        cond, body, (one, one, phi0, phi0, jnp.int32(0),
                     jnp.asarray(False)))
    xn = x - lam * dx
    Fn = F(xn)
    fn = ops.norm(Fn, axis)
    success = fn < fnorm  # accept any decrease (ls.c:248 failure policy)
    return xn, Fn, fn, lam, success


def snes_solve(F: Callable, x0: jax.Array, jac: Union[str, ColoredJacobian,
                                                      Callable] = None,
               pc_builder: Optional[Callable] = None,
               ksp_cfg: KSPConfig = None, cfg: SNESConfig = None,
               axis: Optional[str] = None,
               npc: Optional[Callable] = None,
               pre_check: Optional[Callable] = None,
               post_check: Optional[Callable] = None, **kw) -> SNESResult:
    """Newton-LS solve of F(x) = 0.

    jac: "jvp" (AD matrix-free), "fd" (MFFD), a ColoredJacobian plan
         (assembled FD), or a callable (x, Fx) -> operator.
    pc_builder: callable J -> pc pytree, rebuilt every Newton step
         (only device-rebuildable PCs: jacobi/pbjacobi/cheby-MG).
    npc: optional nonlinear right-preconditioner x → x' (an inner
         solver applied before each Newton step — ls.c:199-211's
         snes->pc composition; e.g. a few NGS sweeps or an FAS cycle).
    pre_check: optional (its, x, dx) -> dx called before the line
         search (SNESLineSearchSetPreCheck; snes ex3 PreCheck).
    post_check: optional (its, x, dx, xn) -> xn called on the
         candidate iterate after the line search
         (SNESLineSearchSetPostCheck; snes ex3 PostCheck — both run
         inside jit, so they must be pure functions)."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    ksp_cfg = ksp_cfg or KSPConfig(ksp_type="gmres", rtol=1e-5, maxits=200)
    jac = jac or cfg.jac
    ksolver = KSP_REGISTRY[ksp_cfg.ksp_type]

    def build_J(x, Fx):
        if jac == "jvp":
            return jvp_operator(F, x, Fx)
        if jac == "fd":
            return mffd_operator(F, x, Fx)
        if isinstance(jac, ColoredJacobian) or hasattr(jac, "assemble"):
            # colored-FD plans (serial ColoredJacobian or the sharded
            # parallel.psnes.ShardedFDJac) assemble against whatever F
            # this solve iterates on — e.g. the TS theta stage residual
            return jac.assemble(F, x, Fx)
        return jac(x, Fx)

    x = x0
    Fx = F(x)
    fnorm = ops.norm(Fx, axis)
    history = jnp.full((cfg.maxits + 1,), jnp.nan, x.dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    fnorm0 = fnorm
    reason = _check(fnorm, fnorm0, jnp.zeros((), x.dtype),
                    ops.norm(x, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, Fx, fnorm, its = c["x"], c["F"], c["fnorm"], c["its"]
        if npc is not None:               # nonlinear right-preconditioning
            x = npc(x)
            Fx = F(x)
            fnorm = ops.norm(Fx, axis)
        J = build_J(x, Fx)
        pc = pc_builder(J) if pc_builder is not None else None
        kres = ksolver(J, Fx, jnp.zeros_like(x), pc, ksp_cfg, axis)
        dx = kres.x                       # J dx = F → step is −dx
        lin_fail = kres.reason < 0
        if pre_check is not None:
            dx = pre_check(its, x, dx)
        if cfg.linesearch == "basic":
            xn = x - dx
            Fn = F(xn)
            fn = ops.norm(Fn, axis)
            ls_ok = jnp.asarray(True)
        elif cfg.linesearch == "l2":
            xn, Fn, fn, lam, ls_ok = _linesearch_l2(
                F, x, dx, fnorm, axis, max_its=cfg.ls_it)
        elif cfg.linesearch == "cp":
            xn, Fn, fn, lam, ls_ok = _linesearch_cp(
                F, x, dx, Fx, axis, max_its=cfg.ls_it)
        else:
            xn, Fn, fn, lam, ls_ok = _linesearch_bt(F, x, dx, Fx, fnorm,
                                                    cfg, axis)
        if post_check is not None:
            xn = post_check(its, x, dx, xn)
            Fn = F(xn)
            fn = ops.norm(Fn, axis)
        snorm = ops.norm(xn - x, axis)
        xnorm = ops.norm(xn, axis)
        its = its + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, snorm, xnorm, its, cfg)
        reason = jnp.where(
            (reason == 0) & ~ls_ok,
            jnp.int32(SNESConvergedReason.DIVERGED_LINE_SEARCH), reason)
        reason = jnp.where(
            (reason == 0) & lin_fail,
            jnp.int32(SNESConvergedReason.DIVERGED_LINEAR_SOLVE), reason)
        return dict(x=xn, F=Fn, fnorm=fn, its=its, history=history,
                    reason=reason)

    out = lax.while_loop(cond, body, dict(x=x, F=Fx, fnorm=fnorm,
                                          its=jnp.int32(0), history=history,
                                          reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"], out["fnorm"],
                      out["history"])


def snes_ksponly(F, x0, jac=None, pc_builder=None, ksp_cfg=None,
                 cfg=None, axis=None, **kw) -> SNESResult:
    """One full-step Newton iteration (src/snes/impls/ksponly): for
    problems already linear(ized) — solve J dx = F once, take the step.
    Reports CONVERGED_ITS after its single iteration (ksponly.c sets
    snes->reason = SNES_CONVERGED_ITS unconditionally)."""
    cfg = replace(cfg or SNESConfig(), **kw, maxits=1, linesearch="basic")
    r = snes_solve(F, x0, jac=jac, pc_builder=pc_builder,
                   ksp_cfg=ksp_cfg, cfg=cfg, axis=axis)
    reason = jnp.where(r.reason == SNESConvergedReason.DIVERGED_MAX_IT,
                       jnp.int32(SNESConvergedReason.CONVERGED_ITS),
                       r.reason)
    return SNESResult(r.x, r.its, reason, r.fnorm, r.history)


def _linesearch_l2(F, x, dx, fnorm, axis, max_its: int = 1,
                   damping: float = 1.0, steptol: float = 1e-12):
    """The reference's L2 line search (linesearchl2.c): secant-Newton
    on the quadratic fit of ‖F(x−λ·dx)‖² through (λ_old, λ_mid, λ),
    default ONE iteration (linesearch.c:63 max_its=1)."""
    lam = jnp.asarray(damping, x.dtype)
    lam_old = jnp.zeros((), x.dtype)
    fnrm_old = fnorm * fnorm
    for _ in range(max_its):
        lam_mid = 0.5 * (lam + lam_old)
        fnrm_mid = ops.norm(F(x - lam_mid * dx), axis) ** 2
        fnrm = ops.norm(F(x - lam * dx), axis) ** 2
        dl = lam - lam_old
        dF = (3.0 * fnrm - 4.0 * fnrm_mid + fnrm_old) / dl
        dF_old = (-3.0 * fnrm_old + 4.0 * fnrm_mid - fnrm) / dl
        d2F = (dF - dF_old) / dl
        lam_upd = jnp.where(d2F > 0, lam - dF / d2F, lam + dF / d2F)
        lam_upd = jnp.where(lam_upd < steptol, 0.5 * (lam + lam_old),
                            lam_upd)
        lam_old, lam, fnrm_old = lam, lam_upd, fnrm
    xn = x - lam * dx
    Fn = F(xn)
    fn = ops.norm(Fn, axis)
    return xn, Fn, fn, lam, jnp.asarray(True)


def _linesearch_cp(F, x, dx, Fx, axis, max_its: int = 1,
                   damping: float = 1.0, steptol: float = 1e-12):
    """The reference's CP line search, linear order, default ONE
    iteration (linesearchcp.c:61,177): secant on g(λ)=⟨F(x−λ·dx),dx⟩
    with the verbatim sign/steptol rules."""
    lam = jnp.asarray(damping, x.dtype)
    lam_old = jnp.zeros((), x.dtype)
    fty_old = ops.dot(Fx, dx, axis)
    for _ in range(max_its):
        fty = ops.dot(F(x - lam * dx), dx, axis)
        s = (fty - fty_old) / (lam - lam_old)
        s = jnp.where(s > 0, -s, s)
        upd = lam - fty / s
        upd = jnp.where(upd < steptol, lam + fty / s, upd)
        lam_old, lam, fty_old = lam, upd, fty
    xn = x - lam * dx
    Fn = F(xn)
    fn = ops.norm(Fn, axis)
    return xn, Fn, fn, lam, jnp.asarray(True)


def snes_nrichardson(F, x0, cfg: SNESConfig = None, axis=None,
                     damping: float = 1.0, **kw) -> SNESResult:
    """Nonlinear Richardson x ← x − λ·F(x) with the reference's
    default L2 line search (src/snes/impls/richardson; linesearch
    default for nrichardson is l2).

    SNESCreate_NRichardson overrides the class stol default to 1e-20
    (snesrichardson.c:262) — without this, the snorm test halts long
    runs like snes ex35_1 thirty iterations early."""
    base = SNESConfig(stol=1e-20)
    cfg = replace(cfg or base, **kw) if kw else (cfg or base)

    x = x0
    Fx = F(x)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, x.dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), x.dtype),
                    ops.norm(x, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x, Fx, fnorm, its = c["x"], c["F"], c["fnorm"], c["its"]
        dx = damping * Fx
        xn, Fn, fn, lam, ls_ok = _linesearch_l2(F, x, dx, fnorm, axis)
        its = its + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(xn - x, axis),
                        ops.norm(xn, axis), its, cfg)
        reason = jnp.where((reason == 0) & ~ls_ok,
                           jnp.int32(SNESConvergedReason.DIVERGED_LINE_SEARCH),
                           reason)
        return dict(x=xn, F=Fn, fnorm=fn, its=its, history=history,
                    reason=reason)

    out = lax.while_loop(cond, body, dict(x=x, F=Fx, fnorm=fnorm,
                                          its=jnp.int32(0), history=history,
                                          reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"], out["fnorm"],
                      out["history"])


class SNES:
    """Stateful wrapper mirroring the reference SNES lifecycle."""

    def __init__(self, options=None, prefix: str = ""):
        from petsctpu.core.options import Options
        self.opts = (options or Options()).prefixed(prefix)
        self.F = None
        self.jac = None
        self.pc_builder = None
        self.axis = None

    def set_function(self, F):
        self.F = F
        return self

    def set_jacobian(self, jac):
        self.jac = jac
        return self

    def set_pc_builder(self, pb):
        self.pc_builder = pb
        return self

    def solve(self, x0) -> SNESResult:
        o = self.opts
        cfg = SNESConfig(
            rtol=o.get_real("snes_rtol", 1e-8),
            atol=o.get_real("snes_atol", 1e-50),
            stol=o.get_real("snes_stol", 1e-8),
            maxits=o.get_int("snes_max_it", 50),
            linesearch=o.get_str("snes_linesearch_type", "bt"),
            monitor=o.get_bool("snes_monitor", False),
            jac="fd" if o.get_bool("snes_mf", False) else "jvp",
        )
        from petsctpu.ksp.api import config_from_options
        ksp_cfg = config_from_options(o, KSPConfig(ksp_type="gmres",
                                                   rtol=1e-5, maxits=200))
        snes_type = o.get_str("snes_type", "newtonls")
        if snes_type == "newtontr":          # -snes_type newtontr (tr.c)
            from petsctpu.snes.variants import snes_tr
            fn = jax.jit(lambda x0: snes_tr(
                self.F, x0, jac=self.jac, pc_builder=self.pc_builder,
                ksp_cfg=ksp_cfg, cfg=cfg, axis=self.axis))
        elif snes_type == "ksponly":
            fn = jax.jit(lambda x0: snes_ksponly(
                self.F, x0, jac=self.jac, pc_builder=self.pc_builder,
                ksp_cfg=ksp_cfg, cfg=cfg, axis=self.axis))
        elif snes_type in ("qn", "ngmres", "anderson", "ncg",
                           "nrichardson"):
            from petsctpu.snes.fas import snes_ncg
            from petsctpu.snes.variants import (snes_anderson,
                                                snes_ngmres, snes_qn)
            impl = {"qn": snes_qn, "ngmres": snes_ngmres,
                    "anderson": snes_anderson, "ncg": snes_ncg,
                    "nrichardson": snes_nrichardson}[snes_type]
            fn = jax.jit(lambda x0: impl(self.F, x0, cfg=cfg,
                                         axis=self.axis))
        else:
            fn = jax.jit(lambda x0: snes_solve(
                self.F, x0, jac=self.jac, pc_builder=self.pc_builder,
                ksp_cfg=ksp_cfg, cfg=cfg, axis=self.axis))
        return fn(x0)


def snes_grid_sequence(da, make_residual: Callable, nrefine: int,
                       x0: jax.Array, initial_guess: Callable = None,
                       solver: Callable = None, **kw):
    """Grid sequencing (-snes_grid_sequence; SNESSolve loop
    snes.c:3609-3674): solve on the given DM, then repeatedly
    DMRefine, Q1-interpolate the converged solution as the finer
    grid's initial guess (MatInterpolate, snes.c:3665), and re-solve.

    make_residual(da) -> F; initial_guess(da) -> x (used only on the
    coarsest grid when x0 is None); solver defaults to snes_solve and
    receives **kw. Returns the list of per-grid SNESResults (finest
    last)."""
    solver = solver or snes_solve
    cur = da
    x = x0 if x0 is not None else initial_guess(cur)
    results = []
    for g in range(nrefine + 1):
        res = solver(make_residual(cur), x, **kw)
        results.append(res)
        if g < nrefine:
            fine = cur.refine()
            P = fine.interpolation(cur)
            x = P.mult(res.x)
            cur = fine
    return results
