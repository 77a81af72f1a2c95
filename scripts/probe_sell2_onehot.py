"""Production-shaped SELL2: grid (nt, npc) over a per-tile-compacted
pass stream (clamped index_map elides refetch beyond each tile's
count), MXU one-hot row select, PC sized by VMEM budget."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    G, WSUB = 16, 64
    NT = 256
    SW = 256
    # per-tile pass counts: uniform-ish around 72 (mean of compacted)
    Pt = rng.integers(56, 88, NT)
    Pt = (np.ceil(Pt / 8) * 8).astype(np.int64)
    PC = 24
    npc = int(np.ceil(Pt.max() / PC))
    # compacted chunk stream: chunk c of tile t lives at chunk_start[t]+c
    nch_t = np.ceil(Pt / PC).astype(np.int64)
    chunk_start = np.zeros(NT + 1, np.int64)
    np.cumsum(nch_t, out=chunk_start[1:])
    NCHT = int(chunk_start[-1])
    print("total chunks", NCHT, "vs padded", NT * npc,
          "ratio", NT * npc / NCHT)

    vals = rng.standard_normal((NCHT, PC, G, 128)).astype(np.float32)
    J = rng.integers(0, 128, (NCHT, PC, G, 128)).astype(np.int8)
    qoff = rng.integers(0, WSUB, (NCHT, PC, G)).astype(np.int8)
    qbase = (rng.integers(0, (SW - WSUB) // 8, NCHT) * 8).astype(np.int32)
    ws = (rng.integers(0, 8, NT) * 8).astype(np.int32)
    xp = rng.standard_normal(((int(ws.max()) + SW + 8), 128)) \
        .astype(np.float32)
    cstart = chunk_start[:-1].astype(np.int32)
    nch = nch_t.astype(np.int32)

    valsd, Jd = jnp.asarray(vals), jnp.asarray(J)
    qoffd, qbased = jnp.asarray(qoff), jnp.asarray(qbase)
    wsd, xpd = jnp.asarray(ws), jnp.asarray(xp)
    cstartd, nchd = jnp.asarray(cstart), jnp.asarray(nch)

    def chunk_of(t, c, cstart_ref, nch_ref):
        return cstart_ref[t] + jnp.minimum(c, nch_ref[t] - 1)

    def kernel(ws_ref, cstart_ref, nch_ref, qb_ref,
               qo_ref, vals_ref, j_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws_ref[t], SW), :], win, sem)
            dma.start()
            dma.wait()

        ch = chunk_of(t, c, cstart_ref, nch_ref)
        live = c < nch_ref[t]

        W = win[pl.ds(qb_ref[ch], WSUB), :]
        qo = qo_ref[0].astype(jnp.int32)                  # [PC, G] VMEM
        iota = jax.lax.broadcasted_iota(jnp.int32, (PC, G, WSUB), 2)
        sel = (iota == qo[:, :, None]).astype(jnp.float32) \
            .reshape(PC * G, WSUB)
        V_all = jax.lax.dot_general(
            sel, W, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(PC):
            V = V_all[16 * p:16 * p + 16, :]
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
            pl.BlockSpec((1, PC, G),
                         lambda t, c, ws_r, cs, nc, qb:
                         (chunk_of(t, c, cs, nc), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC, G, 128),
                         lambda t, c, ws_r, cs, nc, qb:
                         (chunk_of(t, c, cs, nc), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC, G, 128),
                         lambda t, c, ws_r, cs, nc, qb:
                         (chunk_of(t, c, cs, nc), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, 128),
                               lambda t, c, *a: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SW, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NT, G, 128), jnp.float32),
            grid_spec=grid_spec)
        out = np.asarray(f(wsd, cstartd, nchd, qbased, qoffd,
                           valsd, Jd, xpd))
        # emulate
        ref = np.zeros((NT, G, 128), np.float32)
        for t in range(NT):
            win = xp[ws[t]:ws[t] + SW]
            for c in range(int(nch[t])):
                ch = int(cstart[t]) + c
                W = win[qbase[ch]:qbase[ch] + WSUB]
                V_all = W[qoff[ch].reshape(-1).astype(np.int64)]
                for p in range(PC):
                    V = V_all[16 * p:16 * p + 16]
                    ref[t] += vals[ch, p] * np.take_along_axis(
                        V, J[ch, p].astype(np.int64), axis=1)
        print("rel err:",
              np.abs(out - ref).max() / np.abs(ref).max())
    except Exception as e:
        print("FAIL", repr(e)[:250])
        return

    @jax.jit
    def loop(n, xin):
        def body(_, cr):
            y = f(wsd, cstartd, nchd, qbased, qoffd, valsd, Jd,
                  xin + cr * 1e-30)
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
    slots = NCHT * PC * G * 128
    gbs = slots * 5 / dt / 1e9
    print(f"per mult: {dt*1e3:.4f} ms  stream {gbs:.0f} GB/s  "
          f"slots/nnz-equivalent slop 2.67 -> frac "
          f"{round(2*6.86e6*8/dt/689e9, 3)} at double-size")


if __name__ == "__main__":
    main()
