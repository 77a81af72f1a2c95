"""Pallas TPU kernel for the 2-D 5-point stencil SpMV (the hot op).

The jnp pad+slice formulation (mat/stencil.py) materializes a padded
copy of x on every apply — ~25% extra HBM traffic on the dominant
kernel. This kernel reads each operand exactly once (compulsory
traffic only):

  * grid steps walk row strips with the OUTPUT DELAYED BY ONE STEP:
    step i loads x-strip i and computes/writes y-strip i−1, so the
    south halo row of strip i−1 is simply row 0 of the freshly loaded
    strip — no second read, no halo DMA;
  * the previous strip and its north halo row persist in VMEM scratch
    across the sequential grid (TPU grids execute in order);
  * all ±1 row/column shifts are value-level `pltpu.roll`s with
    boundary masks — Mosaic permits only 8-aligned memref slices, so
    the kernel never slices refs at unaligned offsets.

Traffic: 5 coeff planes + x + y = the 7·4·n² compulsory bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pick_tile(m: int, n: int, itemsize: int = 4,
               vmem_budget: int = 12 * 1024 * 1024) -> int:
    """Largest row tile whose live VMEM (coeff block + x + out + scratch,
    double-buffered) fits the budget."""
    for tr in (512, 256, 128, 64, 32, 16, 8):
        if m % tr == 0 and 9 * tr * n * itemsize * 2 <= vmem_budget:
            return tr
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil5_mult_pallas(coeffs: jax.Array, x: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """y = A x for a 5-point star stencil.

    coeffs: [5, m, n] for offsets ((0,0),(-1,0),(1,0),(0,-1),(0,1))
    x:      [m, n] grid-shaped operand (n should be a lane multiple).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, m, n = coeffs.shape
    assert D == 5 and x.shape == (m, n)
    TR = _pick_tile(m, n, np.dtype(x.dtype).itemsize)
    if TR == 0 or n % 128 != 0:
        from petsctpu.mat.stencil import StencilMat
        S = StencilMat(coeffs, ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)),
                       (m, n))
        return S.mult(x.reshape(-1)).reshape(m, n)

    nsteps = m // TR

    def kernel(c_ref, x_ref, o_ref, prev_ref, nrow_ref):
        i = pl.program_id(0)
        cur = x_ref[...]                          # x strip min(i, last)

        @pl.when(i > 0)
        def _():
            j = i - 1                             # strip being computed
            X = prev_ref[...]                     # [TR, n] strip j
            row = jax.lax.broadcasted_iota(jnp.int32, (TR, n), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (TR, n), 1)
            # north: rows shifted +1 (value roll); row 0 from carry
            north = pltpu.roll(X, shift=1, axis=0)
            nhalo = nrow_ref[0:1, :]              # aligned (1,n) read
            first_strip = j == 0
            north = jnp.where(row == 0,
                              jnp.where(first_strip, 0.0, nhalo), north)
            # south: rows shifted -1; last row from cur (or 0 at bottom)
            south = pltpu.roll(X, shift=TR - 1, axis=0)
            last_strip = j == pl.num_programs(0) - 2
            shalo = cur[0:1, :]
            south = jnp.where(row == TR - 1,
                              jnp.where(last_strip, 0.0, shalo), south)
            west = jnp.where(col == 0, 0.0, pltpu.roll(X, shift=1, axis=1))
            east = jnp.where(col == n - 1, 0.0,
                             pltpu.roll(X, shift=n - 1, axis=1))
            o_ref[...] = (c_ref[0] * X + c_ref[1] * north + c_ref[2] * south
                          + c_ref[3] * west + c_ref[4] * east)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)    # overwritten at step 1

        # carry: north halo for the NEXT computed strip = last row of prev
        nrow_ref[...] = jnp.broadcast_to(
            pltpu.roll(prev_ref[...], shift=1, axis=0)[0:1, :], (8, n))
        prev_ref[...] = cur

    last = nsteps - 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(nsteps + 1,),
        in_specs=[
            pl.BlockSpec((5, TR, n),
                         lambda i: (0, jnp.maximum(i - 1, 0), 0)),
            pl.BlockSpec((TR, n), lambda i: (jnp.minimum(i, last), 0)),
        ],
        out_specs=pl.BlockSpec((TR, n), lambda i: (jnp.maximum(i - 1, 0), 0)),
        scratch_shapes=[
            pltpu.VMEM((TR, n), x.dtype),
            pltpu.VMEM((8, n), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(coeffs, x)
    return out
