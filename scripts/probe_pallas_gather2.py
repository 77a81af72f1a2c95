"""Probe 2: 2-D row gather in Pallas + windowed SELL SpMV prototype."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # --- form: jnp.take(x2d, rows, axis=0) --------------------------------
    R, L = 512, 128
    x2 = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, R, size=(1024,)).astype(np.int32))

    def k_rowgather(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)
    try:
        out = pl.pallas_call(
            k_rowgather,
            out_shape=jax.ShapeDtypeStruct((1024, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x2, ridx)
        ref = np.asarray(x2)[np.asarray(ridx)]
        print("row-gather take(axis=0):", "OK",
              float(np.abs(np.asarray(out) - ref).max()))
    except Exception as e:
        print("row-gather take(axis=0): FAIL", repr(e)[:200])

    # --- windowed SELL SpMV prototype -------------------------------------
    # synthetic: n rows, K slots, window W per block of Rb rows
    n, K, W, Rb = 131072, 32, 65536, 2048
    nb = n // Rb
    q = rng.integers(0, W // 128, size=(n, K)).astype(np.int32)
    r = rng.integers(0, 128, size=(n, K)).astype(np.int32)
    vals = rng.standard_normal((n, K)).astype(np.float32)
    starts = (rng.integers(0, 2, size=(nb,)) * 128).astype(np.int32)
    x = rng.standard_normal(n + W + 256).astype(np.float32)

    qd, rd, vd = jnp.asarray(q), jnp.asarray(r), jnp.asarray(vals)
    sd, xd = jnp.asarray(starts), jnp.asarray(x)

    def kernel(s_ref, q_ref, r_ref, v_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        st = s_ref[t]
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(st, W)], win, sem)
        dma.start()
        dma.wait()
        w2 = win[:].reshape(W // 128, 128)
        acc = jnp.zeros((Rb,), jnp.float32)
        for k in range(K):
            rows = jnp.take(w2, q_ref[:, k], axis=0)        # [Rb, 128]
            picked = jnp.take_along_axis(rows, r_ref[:, k:k + 1],
                                         axis=1)[:, 0]
            acc = acc + v_ref[:, k] * picked
        o_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Rb, K), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, K), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Rb, K), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((Rb,), lambda t, s: (t,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    try:
        spmv = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
            grid_spec=grid_spec,
        )
        out = spmv(sd, qd, rd, vd, xd)
        # reference
        gidx = (starts[:, None, None].repeat(Rb, 1).reshape(n, 1)
                + q * 128 + r)
        ref = (vals * x[gidx]).sum(axis=1)
        err = float(np.abs(np.asarray(out) - ref).max()
                    / np.abs(ref).max())
        print("windowed SELL kernel: OK, rel err", err)

        @jax.jit
        def chain(sd, qd, rd, vd, xv, iters):
            from jax import lax
            def body(_, v):
                y = spmv(sd, qd, rd, vd, v)
                return jnp.concatenate(
                    [y * np.float32(0.05),
                     jnp.zeros(W + 256, jnp.float32)])
            return jnp.sum(lax.fori_loop(0, iters, body, xv))

        def timed(it):
            t0 = time.perf_counter()
            s = float(chain(sd, qd, rd, vd, xd, jnp.int32(it)))
            return time.perf_counter() - t0
        timed(1)
        lo = min(timed(5) for _ in range(2))
        hi = min(timed(55) for _ in range(2))
        dt = max(hi - lo, 1e-9) / 50
        nnz = n * K
        traffic = 4.0 * (3 * n * K + 2 * n)   # vals + q + r + x + y
        print(f"windowed SELL: {dt*1e3:.3f} ms  {nnz/dt:.3e} nnz/s  "
              f"{traffic/dt/1e9:.1f} GB/s stream-equiv")
    except Exception as e:
        import traceback
        traceback.print_exc()
        print("windowed SELL kernel: FAIL", repr(e)[:300])


if __name__ == "__main__":
    main()
