"""KSP shared infrastructure: norm policy, convergence test, monitors.

Mirrors the reference's KSP interface layer (src/ksp/ksp/interface):
KSPDefaultConverged (iterativ.c:702 — rtol/atol/dtol on the selected
residual norm), norm-type policy (none/preconditioned/unpreconditioned/
natural), monitors and residual history. Because the solve loop is a
`lax.while_loop`, convergence state is an int32 reason code in the
carry; monitors stream through `jax.debug.callback`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from petsctpu.core.errors import ConvergedReason

NORM_NONE = "none"
NORM_PRECONDITIONED = "preconditioned"
NORM_UNPRECONDITIONED = "unpreconditioned"
NORM_NATURAL = "natural"


@dataclass(frozen=True)
class KSPConfig:
    """Static solver configuration (hashable: safe as a jit static arg)."""

    ksp_type: str = "gmres"
    rtol: float = 1e-5
    atol: float = 1e-50
    divtol: float = 1e5
    maxits: int = 10000
    restart: int = 30                   # GMRES restart
    norm_type: Optional[str] = None     # None -> solver default
    monitor: bool = False
    monitor_true: bool = False          # -ksp_monitor_true_residual
    orth: str = "cgs"                   # gmres orthogonalization: cgs|mgs
    cgs_refine: str = "never"           # never|ifneeded|always
    richardson_scale: float = 1.0
    # -ksp_richardson_self_scale (rich.c:16,84: per-step optimal
    # damping scale = (Br)ᵀ(BABr)/(BABr)ᵀ(BABr))
    richardson_self_scale: bool = False
    cheby_emin: float = 0.0             # 0 -> auto-estimate
    cheby_emax: float = 0.0
    guess_nonzero: bool = False
    radius: float = 0.0                 # trust-region radius (stcg/nash/gltr; 0 -> unconstrained)
    aug_dim: int = 2                    # LGMRES augmentation dimension
    bcgsl_ell: int = 2                  # BiCGStab(l) polynomial degree
    # -ksp_lag_norm (KSPSetLagNorm itfunc.c): convergence tests use the
    # PREVIOUS iteration's residual norm, letting IBCGS fuse the norm
    # into its single recurrence reduction. Default off like the
    # reference (default IBCGS pays a second reduction per iteration).
    lag_norm: bool = False
    # -ksp_cg_single_reduction (KSPCGUseSingleReduction, cg.c:349):
    # keep s = Az and reconstruct p'Ap from the delta/beta recurrence
    # so the iteration's inner products merge into one reduction
    cg_single_reduction: bool = False


class SolveResult(NamedTuple):
    x: jax.Array
    its: jax.Array          # int32 iteration count
    reason: jax.Array       # int32 ConvergedReason
    rnorm: jax.Array        # final residual norm
    history: jax.Array      # [maxits+1] residual history (NaN-padded)

    def reason_enum(self) -> ConvergedReason:
        return ConvergedReason(int(self.reason))

    @property
    def converged(self):
        return int(self.reason) > 0


def check_convergence(rnorm, rnorm0, its, cfg: KSPConfig):
    """KSPDefaultConverged (iterativ.c:702) as a pure function → reason."""
    bad = jnp.isnan(rnorm) | jnp.isinf(rnorm)
    ttol = jnp.maximum(cfg.rtol * rnorm0, cfg.atol)
    reason = jnp.where(
        bad, ConvergedReason.DIVERGED_NANORINF,
        jnp.where(
            rnorm <= cfg.atol, ConvergedReason.CONVERGED_ATOL,
            jnp.where(
                rnorm <= ttol, ConvergedReason.CONVERGED_RTOL,
                jnp.where(
                    rnorm > cfg.divtol * rnorm0, ConvergedReason.DIVERGED_DTOL,
                    jnp.where(its >= cfg.maxits, ConvergedReason.DIVERGED_ITS,
                              ConvergedReason.ITERATING)))))
    return reason.astype(jnp.int32)


def _fmt_short(rnorm):
    """KSPMonitorDefaultShort formatting (iterativ.c): %g above 1e-9,
    %5.3e down to 1e-11, then the literal '< 1.e-11'."""
    r = float(rnorm)
    if r > 1e-9:
        return f"{r:g}"
    if r > 1e-11:
        return f"{r:5.3e}"
    return "< 1.e-11"


def _monitor_print(its, rnorm):
    print(f"{int(its):3d} KSP Residual norm {_fmt_short(rnorm)} ")


def _monitor_print_if(pred, its, rnorm):
    if bool(pred):
        print(f"{int(its):3d} KSP Residual norm {_fmt_short(rnorm)} ")


def monitor_cb(cfg: KSPConfig, its, rnorm):
    """Stream per-iteration residuals to the host (-ksp_monitor analog)."""
    if cfg.monitor:
        jax.debug.callback(_monitor_print, its, rnorm, ordered=True)


def monitor_cb_if(cfg: KSPConfig, pred, its, rnorm):
    """Monitor gated by a traced predicate (e.g. only at first cycle)."""
    if cfg.monitor:
        jax.debug.callback(_monitor_print_if, pred, its, rnorm, ordered=True)


def _monitor_true_print(its, rnorm, trnorm, rel):
    print(f"{int(its):3d} KSP preconditioned resid norm "
          f"{float(rnorm):14.12e} true resid norm {float(trnorm):14.12e} "
          f"||r(i)||/||b|| {float(rel):14.12e}")


def _monitor_true_print_if(pred, its, rnorm, trnorm, rel):
    if bool(pred):
        _monitor_true_print(its, rnorm, trnorm, rel)


def monitor_true_cb_if(cfg: KSPConfig, pred, its, rnorm, trnorm, bnorm):
    if cfg.monitor_true:
        rel = trnorm / jnp.where(bnorm > 0, bnorm, 1.0)
        jax.debug.callback(_monitor_true_print_if, pred, its, rnorm,
                           trnorm, rel, ordered=True)


def monitor_true_cb(cfg: KSPConfig, its, rnorm, trnorm, bnorm):
    """-ksp_monitor_true_residual (KSPMonitorTrueResidualNorm,
    iterativ.c): prints the preconditioned estimate, the actual
    ‖b − Ax‖ (KSPBuildResidual), and its ratio to ‖b‖."""
    if cfg.monitor_true:
        rel = trnorm / jnp.where(bnorm > 0, bnorm, 1.0)
        jax.debug.callback(_monitor_true_print, its, rnorm, trnorm, rel,
                           ordered=True)


def record(history, its, rnorm):
    # norms are real; coerce (a complex-typed zero-imag sqrt slips
    # through in some complex solvers and future jax makes the
    # implicit scatter cast an error)
    return history.at[its].set(jnp.real(rnorm))


def init_history(cfg: KSPConfig, dtype):
    # residual norms are real even for complex solves
    rdtype = jnp.zeros((), dtype).real.dtype
    return jnp.full((cfg.maxits + 1,), jnp.nan, dtype=rdtype)


def make_initial_residual(A, b, x, pc, guess_nonzero: bool):
    """r = b - A x (or r = b for zero guess)."""
    if guess_nonzero:
        return b - A.mult(x)
    return b


def rnorm0_reference(cfg, b, pc, nt, axis, r0norm):
    """The reference's relative-tolerance base (KSPDefaultConverged,
    iterativ.c:703-733): with a NONZERO initial guess the rtol test is
    against the RHS norm — ‖b‖ for unpreconditioned norm / right PC,
    ‖M⁻¹b‖ for preconditioned, √(bᵀM⁻¹b) for natural — falling back
    to the initial residual norm when that RHS norm is zero. With the
    (default) zero guess, the two coincide and r0norm is returned."""
    from petsctpu.vec import ops

    if not cfg.guess_nonzero:
        return r0norm
    if nt == NORM_UNPRECONDITIONED:
        s = ops.norm(b, axis)
    elif nt == NORM_NATURAL:
        z = apply_pc(pc, b)
        s = jnp.sqrt(jnp.abs(ops.dot(b, z, axis)))
    else:
        s = ops.norm(apply_pc(pc, b), axis)
    return jnp.where(s > 0, s, r0norm)


def apply_pc(pc, r):
    return r if pc is None else pc.apply(r)
