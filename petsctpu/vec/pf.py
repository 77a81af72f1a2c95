"""PF — pointwise function class.

Reference: src/vec/pf (PFCreate/PFSetType/PFApply/PFApplyVec;
impls constant, identity, quick [function pointer], string
[runtime-compiled C]). Here a PF is a named, registered wrapper
around a jit-safe elementwise function; the "string" type evaluates
a math expression in a restricted jnp namespace instead of compiling
C — XLA is the runtime compiler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp

PF_REGISTRY = {}


def register_pf(name: str, factory) -> None:
    """PFRegisterDynamic analog: factory(**kwargs) -> PF."""
    PF_REGISTRY[name] = factory


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PF:
    """Pointwise function: apply maps a Vec (or ndarray) elementwise /
    pointwise (PFApplyVec, src/vec/pf/interface/pf.c)."""

    fn: Callable = field(metadata=dict(static=True))
    name: str = field(metadata=dict(static=True), default="quick")

    def apply(self, x):
        return self.fn(x)

    __call__ = apply


def make_pf(pf_type: str = "identity", **kw) -> PF:
    """PFCreate+PFSetType analog."""
    if pf_type in PF_REGISTRY:
        return PF_REGISTRY[pf_type](**kw)
    if pf_type == "identity":
        return PF(lambda x: x, "identity")
    if pf_type == "constant":
        c = kw.get("value", 0.0)
        return PF(lambda x: jnp.full_like(x, c), "constant")
    if pf_type == "quick":
        return PF(kw["fn"], "quick")
    if pf_type == "string":
        expr = kw["expr"]
        ns = {k: getattr(jnp, k) for k in
              ("sin", "cos", "tan", "exp", "log", "sqrt", "abs", "tanh",
               "sinh", "cosh", "arctan", "arcsin", "arccos", "sign",
               "minimum", "maximum", "where", "pi", "e")}
        code = compile(expr, "<pf-string>", "eval")
        for nm in code.co_names:
            if nm not in ns and nm != "x":
                raise ValueError(f"pf string: unknown name {nm!r}")

        def fn(x, _code=code, _ns=ns):
            return eval(_code, {"__builtins__": {}}, dict(_ns, x=x))
        return PF(fn, "string")
    raise ValueError(f"unknown pf_type {pf_type!r}")
