"""Probe 8: SELL-X kernel prototype (crossed gathers).

Per chunk of PC=8 passes, one half-window h[chunk]:
  U  = take_along_axis(T_h [128,128], I1 [128, 128], axis=1)
  Ut = U.T                                  # [128(p,g), 128(a)]
  per pass p: V = Ut[16p:16p+16]            # [G, 128]
              acc += vals[p] * take_along_axis(V, J[p], axis=1)
T_h = transposed half-window: T_h[a, r] = win[128h + r, a].

Verifies against a numpy emulation; times at bench scale.
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    G, PC = 16, 8
    NT, NCH = 128, 5              # tiles, chunks/tile -> P = 40
    SW = 256                      # window rows (2 halves)

    vals = rng.standard_normal((NT, NCH, PC, G, 128)).astype(np.float32)
    J = rng.integers(0, 128, (NT, NCH, PC, G, 128)).astype(np.int8)
    I1 = rng.integers(0, 128, (NT, NCH, 128, 128)).astype(np.int8)
    hh = rng.integers(0, 2, (NT, NCH)).astype(np.int32)
    ws = (rng.integers(0, 8, NT) * 8).astype(np.int32)
    x = rng.standard_normal(((int(ws.max()) + SW + 8) * 128,)) \
        .astype(np.float32)
    xp = x.reshape(-1, 128)

    # numpy emulation
    ref = np.zeros((NT, G, 128), np.float32)
    for t in range(NT):
        win = xp[ws[t]:ws[t] + SW]                  # [SW, 128]
        for c in range(NCH):
            T = win[128 * hh[t, c]:128 * hh[t, c] + 128].T  # [a, r]
            U = np.take_along_axis(T, I1[t, c].astype(np.int64), axis=1)
            Ut = U.T                                 # [(p,g), a]
            for p in range(PC):
                V = Ut[16 * p:16 * p + 16]
                ref[t] += vals[t, c, p] * np.take_along_axis(
                    V, J[t, c, p].astype(np.int64), axis=1)

    valsd = jnp.asarray(vals)
    Jd = jnp.asarray(J)
    I1d = jnp.asarray(I1)
    hhd = jnp.asarray(hh)
    wsd = jnp.asarray(ws)
    xpd = jnp.asarray(xp)

    def kernel(ws_ref, hh_ref, vals_ref, j_ref, i1_ref, x_hbm, o_ref,
               win, sem):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws_ref[t], SW), :], win, sem)
            dma.start()
            dma.wait()

        h = hh_ref[t, c]
        Wh = win[pl.ds(h * 128, 128), :]             # [r, a]
        T = Wh.T                                     # [a, r]
        U = jnp.take_along_axis(T, i1_ref[0, 0].astype(jnp.int32),
                                axis=1)              # [a, (p,g)]
        Ut = U.T                                     # [(p,g), a]
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(PC):
            V = Ut[16 * p:16 * p + 16, :]
            acc = acc + vals_ref[0, 0, p] * jnp.take_along_axis(
                V, j_ref[0, 0, p].astype(jnp.int32), axis=1)

        @pl.when(c == 0)
        def _():
            o_ref[0] = acc

        @pl.when(c != 0)
        def _():
            o_ref[0] = o_ref[0] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NT, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, PC, G, 128),
                         lambda t, c, *a: (t, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PC, G, 128),
                         lambda t, c, *a: (t, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128, 128),
                         lambda t, c, *a: (t, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, 128), lambda t, c, *a: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SW, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, G, 128), jnp.float32),
            grid_spec=grid_spec)
        out = np.asarray(f(wsd, hhd, valsd, Jd, I1d, xpd))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print("kernel OK, rel err:", err)
    except Exception as e:
        print("FAIL", repr(e)[:300])
        return

    @jax.jit
    def loop(n, xin):
        def body(_, c):
            y = f(wsd, hhd, valsd, Jd, I1d, xin + c * 1e-30)
            return jnp.float32(1e-30) * jnp.sum(y)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def tme(n):
        t0 = time.perf_counter()
        float(loop(jnp.int32(n), xpd))
        return time.perf_counter() - t0
    tme(1)
    lo = min(tme(5) for _ in range(3))
    hi = min(tme(105) for _ in range(3))
    dt = (hi - lo) / 100
    slots = NT * NCH * PC * G * 128
    traffic = slots * 5 + NT * NCH * 128 * 128 * 1
    print(f"per mult: {dt*1e3:.4f} ms  {slots/dt/1e9:.1f}G slots/s  "
          f"traffic {traffic/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
