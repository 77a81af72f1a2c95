"""Compacted per-tile-q SELL (existing semantics, variable pass count
per tile via clamped chunk indexing)."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    G = 16
    NT = 256
    SW = 224
    Pt = rng.integers(70, 134, NT)      # bench-like distribution
    PC = 24
    nch_t = np.ceil(Pt / PC).astype(np.int64)
    npc = int(nch_t.max())
    chunk_start = np.zeros(NT + 1, np.int64)
    np.cumsum(nch_t, out=chunk_start[1:])
    NCHT = int(chunk_start[-1])
    print("chunks", NCHT, "padded", NT * npc, "ratio",
          round(NT * npc / NCHT, 2))

    vals = rng.standard_normal((NCHT, PC, G, 128)).astype(np.float32)
    J = rng.integers(0, 128, (NCHT, PC, G, 128)).astype(np.int8)
    qs = rng.integers(0, SW - G, (NCHT, PC)).astype(np.int32)
    ws = (rng.integers(0, 8, NT) * 8).astype(np.int32)
    xp = rng.standard_normal(((int(ws.max()) + SW + 8), 128)) \
        .astype(np.float32)
    cstart = chunk_start[:-1].astype(np.int32)
    nch = nch_t.astype(np.int32)

    args = [jnp.asarray(a) for a in (ws, cstart, nch, qs, vals, J, xp)]

    def chunk_of(t, c, cs, nc):
        return cs[t] + jnp.minimum(c, nc[t] - 1)

    def kernel(ws_ref, cs_ref, nc_ref, qs_ref, vals_ref, j_ref,
               x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws_ref[t], SW), :], win, sem)
            dma.start()
            dma.wait()

        ch = chunk_of(t, c, cs_ref, nc_ref)
        live = c < nc_ref[t]
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(PC):
            V = win[pl.ds(qs_ref[ch, p], G), :]
            acc = acc + vals_ref[0, p] * jnp.take_along_axis(
                V, j_ref[0, p].astype(jnp.int32), axis=1)
        acc = jnp.where(live, acc, 0.0)

        @pl.when(c == 0)
        def _():
            o_ref[0] = acc

        @pl.when(c != 0)
        def _():
            o_ref[0] = o_ref[0] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NT, npc),
        in_specs=[
            pl.BlockSpec((1, PC, G, 128),
                         lambda t, c, w, cs, nc, q:
                         (chunk_of(t, c, cs, nc), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC, G, 128),
                         lambda t, c, w, cs, nc, q:
                         (chunk_of(t, c, cs, nc), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, 128), lambda t, c, *a: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SW, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((NT, G, 128), jnp.float32),
        grid_spec=grid_spec)
    out = np.asarray(f(*args))
    ref = np.zeros((NT, G, 128), np.float32)
    for t in range(NT):
        win = xp[ws[t]:ws[t] + SW]
        for c in range(int(nch[t])):
            chn = int(cstart[t]) + c
            for p in range(PC):
                V = win[qs[chn, p]:qs[chn, p] + G]
                ref[t] += vals[chn, p] * np.take_along_axis(
                    V, J[chn, p].astype(np.int64), axis=1)
    print("rel err:", np.abs(out - ref).max() / np.abs(ref).max())

    @jax.jit
    def loop(n, a0, a1, a2, a3, a4, a5, xin):
        def body(_, cr):
            y = f(a0, a1, a2, a3, a4, a5, xin + cr * 1e-30)
            return jnp.float32(1e-30) * jnp.sum(y)
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    def tme(n):
        t0 = time.perf_counter()
        float(loop(jnp.int32(n), *args))
        return time.perf_counter() - t0
    tme(1)
    lo = min(tme(5) for _ in range(3))
    hi = min(tme(105) for _ in range(3))
    dt = (hi - lo) / 100
    slots = NCHT * PC * G * 128
    print(f"per mult: {dt*1e3:.4f} ms  own stream "
          f"{slots*5/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
