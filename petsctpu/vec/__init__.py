from petsctpu.vec.ops import (
    psum, dot, norm, norm_1, norm_inf, mdot, axpy, aypx, waxpy,
    pointwise_mult, pointwise_divide, reduce_all,
)

__all__ = [
    "psum", "dot", "norm", "norm_1", "norm_inf", "mdot", "axpy", "aypx",
    "waxpy", "pointwise_mult", "pointwise_divide", "reduce_all",
]
