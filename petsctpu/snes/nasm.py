"""SNES NASM (nonlinear additive Schwarz) and MS (multi-stage smoothers).

Reference: src/snes/impls/nasm/nasm.c (per-subdomain nonlinear solves
combined additively, optional damping) and src/snes/impls/ms/ms.c
(explicit multi-stage Shu-Osher-form smoothers — Jameson / van
Leer-Tai-Powell schemes, used as FAS smoothers for hyperbolic
problems).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from petsctpu.core.errors import SNESConvergedReason
from petsctpu.ksp.common import KSPConfig
from petsctpu.snes.api import SNESConfig, SNESResult, _check, _monitor, snes_solve
from petsctpu.vec import ops


def snes_nasm(F: Callable, x0: jax.Array, subdomains: Sequence,
              damping: float = 1.0, inner_its: int = 2,
              cfg: SNESConfig = None, axis: Optional[str] = None,
              nasm_type: str = "basic", owned: Sequence = None,
              inner_cfg: SNESConfig = None, inner_ksp: KSPConfig = None,
              **kw) -> SNESResult:
    """Nonlinear additive Schwarz (SNESNASM).

    subdomains: list of index arrays. Each outer iteration solves every
    subdomain's restricted problem F(x with x_i replaced)[idx_i] = 0 by
    a few Newton steps (matrix-free GMRES inner), holding the other
    unknowns at their current values, then combines the corrections.

    nasm_type (SNESNASMSetType):
      "basic"    — additive with partition-of-unity weights on overlap
                   (+ optional damping), the SNESNASMSetDamping path;
      "restrict" — restricted additive Schwarz (the reference's
                   -snes_nasm_type restrict / PC_ASM_RESTRICT analog):
                   solve on the OVERLAPPING subdomain, write back only
                   the `owned` (non-overlapping) points — no weights.
                   `owned` is the per-subdomain disjoint index list."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    subs = [jnp.asarray(np.asarray(s, np.int32)) for s in subdomains]
    # overlap weights (partition of unity)
    mult = np.zeros(x0.shape[0])
    for s in subdomains:
        mult[np.asarray(s)] += 1.0
    wts = [jnp.asarray(1.0 / mult[np.asarray(s)], x0.dtype)
           for s in subdomains]
    if nasm_type == "restrict":
        assert owned is not None, "restrict type needs owned index lists"
        # position of each owned point inside its subdomain's list
        own_pos = []
        for s, o in zip(subdomains, owned):
            lookup = {int(g): k for k, g in enumerate(np.asarray(s))}
            own_pos.append(jnp.asarray(
                np.array([lookup[int(g)] for g in np.asarray(o)],
                         np.int32)))
        owned_j = [jnp.asarray(np.asarray(o, np.int32)) for o in owned]
    inner_cfg = inner_cfg or SNESConfig(maxits=inner_its, rtol=1e-8,
                                        linesearch="bt")
    inner_ksp = inner_ksp or KSPConfig(ksp_type="gmres", rtol=1e-6,
                                       maxits=100)

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, x0.dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), x0.dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def local_correction(x, idx):
        def Fi(xi):
            return F(x.at[idx].set(xi))[idx]

        res = snes_solve(Fi, x[idx], jac="jvp", cfg=inner_cfg,
                         ksp_cfg=inner_ksp)
        return res.x - x[idx]

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x = c["x"]
        dx = jnp.zeros_like(x)
        if nasm_type == "restrict":
            for idx, og, pos in zip(subs, owned_j, own_pos):
                dx = dx.at[og].set(local_correction(x, idx)[pos])
        else:
            for idx, w in zip(subs, wts):
                dx = dx.at[idx].add(w * local_correction(x, idx))
        xn = x + damping * dx
        fn = ops.norm(F(xn), axis)
        its = c["its"] + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(xn - x, axis),
                        ops.norm(xn, axis), its, cfg)
        return dict(x=xn, its=its, history=history, reason=reason)

    out = lax.while_loop(cond, body, dict(x=x0, its=jnp.int32(0),
                                          history=history, reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"],
                      ops.norm(F(out["x"]), axis), out["history"])


def snes_multiblock(F: Callable, x0: jax.Array, fields: Sequence,
                    mode: str = "multiplicative", inner_its: int = 3,
                    cfg: SNESConfig = None, axis: Optional[str] = None,
                    **kw) -> SNESResult:
    """SNES multiblock (src/snes/impls/multiblock): per-FIELD nonlinear
    solves, combined additively or multiplicatively — the nonlinear
    counterpart of PCFieldSplit. fields: list of index arrays (e.g.
    DMComposite.global_iss() indices)."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    if mode == "additive":
        return snes_nasm(F, x0, fields, damping=1.0, inner_its=inner_its,
                         cfg=cfg, axis=axis)
    subs = [jnp.asarray(np.asarray(s, np.int32)) for s in fields]
    inner_cfg = SNESConfig(maxits=inner_its, rtol=1e-8, linesearch="bt")
    inner_ksp = KSPConfig(ksp_type="gmres", rtol=1e-6, maxits=100)

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, x0.dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), x0.dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x = c["x"]
        for idx in subs:                       # Gauss-Seidel over fields
            def Fi(xi, x=x, idx=idx):
                return F(x.at[idx].set(xi))[idx]

            res = snes_solve(Fi, x[idx], jac="jvp", cfg=inner_cfg,
                             ksp_cfg=inner_ksp)
            x = x.at[idx].set(res.x)
        fn = ops.norm(F(x), axis)
        its = c["its"] + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(x - c["x"], axis),
                        ops.norm(x, axis), its, cfg)
        return dict(x=x, its=its, history=history, reason=reason)

    out = lax.while_loop(cond, body, dict(x=x0, its=jnp.int32(0),
                                          history=history, reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"],
                      ops.norm(F(out["x"]), axis), out["history"])


# Multi-stage schemes: name -> (betasub stage coefficients, damping)
# (ms.c SNESMSRegisterAll: euler, jameson83, vltp21..61)
MS_SCHEMES = {
    "euler": ([1.0], 1.0),
    "jameson83": ([0.25, 0.5, 0.55, 1.0], 1.0),
    "vltp21": ([0.3333, 1.0], 1.0),
    "vltp31": ([0.1481, 0.4000, 1.0], 1.5),
    "vltp41": ([0.0833, 0.2069, 0.4265, 1.0], 2.0),
    "vltp51": ([0.0533, 0.1263, 0.2375, 0.4414, 1.0], 2.5),
    "vltp61": ([0.0370, 0.0851, 0.1521, 0.2562, 0.4512, 1.0], 3.0),
}


def snes_ms(F: Callable, x0: jax.Array, scheme: str = "jameson83",
            damping: float = None, scale: Optional[jax.Array] = None,
            cfg: SNESConfig = None, axis: Optional[str] = None,
            **kw) -> SNESResult:
    """Explicit multi-stage smoothing iterations (SNESMS, ms.c).

    Each outer iteration runs the stages x_(i) = x_0 − β_i·h·S·F(x_(i−1))
    (Shu-Osher form with the diagonal schemes of SNESMSRegisterAll);
    S is an optional scaling (e.g. 1/diag(J), the reference applies the
    linear-solver preconditioner here), h the damping/pseudo-CFL."""
    cfg = replace(cfg or SNESConfig(), **kw) if kw else (cfg or SNESConfig())
    betas, h_default = MS_SCHEMES[scheme]
    h = damping if damping is not None else h_default

    def S(v):
        return v if scale is None else scale * v

    Fx = F(x0)
    fnorm = ops.norm(Fx, axis)
    fnorm0 = fnorm
    history = jnp.full((cfg.maxits + 1,), jnp.nan, x0.dtype).at[0].set(fnorm)
    _monitor(cfg, 0, fnorm)
    reason = _check(fnorm, fnorm0, jnp.zeros((), x0.dtype),
                    ops.norm(x0, axis), jnp.int32(0), cfg)

    def cond(c):
        return c["reason"] == SNESConvergedReason.ITERATING

    def body(c):
        x0_ = c["x"]
        x = x0_
        for b in betas:
            x = x0_ - b * h * S(F(x))
        fn = ops.norm(F(x), axis)
        its = c["its"] + 1
        history = c["history"].at[its].set(fn)
        _monitor(cfg, its, fn)
        reason = _check(fn, fnorm0, ops.norm(x - x0_, axis),
                        ops.norm(x, axis), its, cfg)
        return dict(x=x, its=its, history=history, reason=reason)

    out = lax.while_loop(cond, body, dict(x=x0, its=jnp.int32(0),
                                          history=history, reason=reason))
    return SNESResult(out["x"], out["its"], out["reason"],
                      ops.norm(F(out["x"]), axis), out["history"])
