"""Debug-mode validation — the race-detection / fp-trap analog.

Reference equivalents (SURVEY §5.2): guarded mallocs + CHKMEMQ /
PetscMallocValidate (src/sys/memory/mtr.c:124) catch overwrite races;
PetscSetFPTrap (src/sys/error/fp.c:449) turns FP exceptions into
errors; the assembly state machine (MatAssembled checks, insert-mode
allreduce mpiaij.c:643) catches cross-rank API races. Under jit there
are no raw mallocs and no data races — the failure modes that remain
are NaN/Inf generation and out-of-bounds gather indices (which XLA
silently clamps). This module makes both loud:

  * `checked(fn)` — wraps a function with jax.experimental.checkify
    (nan + index + div checks); errors raise host-side with location.
  * `validate_operator(A)` — plan-time audit of a device sparse
    operator: finite values, index bounds, shape consistency (the
    MatAssembled / MatValid analog).
  * `fp_trap(True)` — jax_debug_nans: any NaN produced under jit
    raises immediately (PetscSetFPTrap analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from petsctpu.core.errors import PetscTPUError

_CHECKS = checkify.index_checks | checkify.nan_checks | checkify.div_checks


def checked(fn, checks=_CHECKS):
    """Wrap fn so NaN/OOB/div-by-zero inside raise PetscTPUError."""
    cfn = checkify.checkify(fn, errors=checks)

    @functools.wraps(fn)
    def run(*args, **kw):
        err, out = cfn(*args, **kw)
        try:
            checkify.check_error(err)
        except Exception as e:          # noqa: BLE001 — rewrap with context
            raise PetscTPUError(f"debug check failed in "
                                f"{getattr(fn, '__name__', fn)}: {e}") from e
        return out

    return run


def fp_trap(flag: bool = True) -> None:
    """PetscSetFPTrap analog: raise on any NaN produced under jit."""
    jax.config.update("jax_debug_nans", bool(flag))


def validate_operator(A) -> None:
    """MatValid / assembly-state audit: raises PetscTPUError on
    non-finite values or out-of-range indices in a device operator."""
    n_rows, n_cols = A.shape

    def _chk_idx(idx, hi, what):
        i = np.asarray(idx)
        if i.size and (i.min() < 0 or i.max() >= hi):
            raise PetscTPUError(
                f"{type(A).__name__}: {what} index out of range "
                f"[{i.min()}, {i.max()}] vs bound {hi}")

    def _chk_vals(v, what):
        vv = np.asarray(v)
        if vv.size and not np.isfinite(vv).all():
            bad = int((~np.isfinite(vv)).sum())
            raise PetscTPUError(
                f"{type(A).__name__}: {bad} non-finite entries in {what}")

    if hasattr(A, "cols"):                       # AIJ / ELL
        _chk_idx(A.cols, n_cols, "column")
        _chk_vals(A.vals, "vals")
    elif hasattr(A, "bcols"):                    # BAIJ / SBAIJ
        _chk_idx(A.bcols, n_cols // A.bs, "block column")
        _chk_vals(A.bvals, "bvals")
    elif hasattr(A, "coeffs"):                   # StencilMat
        _chk_vals(A.coeffs, "coeffs")
    elif hasattr(A, "locals_"):                  # MatIS
        for i, (Ai, gi) in enumerate(zip(A.locals_, A.l2g)):
            _chk_idx(gi, n_rows, f"l2g[{i}]")
            validate_operator(Ai)
    else:
        _chk_vals(getattr(A, "M", jnp.zeros(0)), "dense")


def validate_system(A, b) -> None:
    """Pre-solve audit (the KSPSolve entry checks): operator valid,
    rhs finite, shapes consistent."""
    validate_operator(A)
    bb = np.asarray(b)
    if not np.isfinite(bb).all():
        raise PetscTPUError("rhs contains non-finite entries")
    if bb.reshape(-1).shape[0] != A.shape[0]:
        raise PetscTPUError(f"rhs size {bb.reshape(-1).shape[0]} != "
                            f"operator rows {A.shape[0]}")
