"""Probe 7: per-pass row-select variants for SELL v2, timed inside a
realistic chunked kernel loop (fori_loop over many pallas grid steps).

Baseline: current SELL pass (one G-row dynamic slice + lane gather).
V1: 16 single-row dynamic slices (per-group q) + lane gather.
V2: one-hot [G,32] matmul over a 32-row sub-window + lane gather.
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
    G, S = 16, 224
    NT, P = 128, 96          # tiles x passes (compacted-stream scale)
    vals = jnp.asarray(rng.standard_normal((NT, P, G, 128))
                       .astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (NT, P, G, 128))
                      .astype(np.int8))
    qs = jnp.asarray(rng.integers(0, S - G, (NT, P)).astype(np.int32))
    qg = jnp.asarray(rng.integers(0, S - G, (NT, P, G)).astype(np.int32))
    qbase = jnp.minimum(jnp.min(qg, axis=2), S - 32)
    qoff = jnp.minimum(qg - qbase[:, :, None], 31).astype(np.int32)
    xp = jnp.asarray(rng.standard_normal((S + 64, 128)).astype(np.float32))

    def mk(kernel, extra):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(extra),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, P, G, 128), lambda t, *a: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, G, 128), lambda t, *a: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, G, 128), lambda t, *a: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((NT, G, 128),
                                                   jnp.float32),
            grid_spec=grid_spec)

    def k_base(qs_ref, vals_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(0, S), :], win, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(P):
            V = win[pl.ds(qs_ref[t, p], G), :]
            acc = acc + vals_ref[0, p] * jnp.take_along_axis(
                V, idx_ref[0, p].astype(jnp.int32), axis=1)
        o_ref[0] = acc

    def k_slices(qg_ref, vals_ref, idx_ref, x_hbm, o_ref, win, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(0, S), :], win, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(P):
            rows = [win[pl.ds(qg_ref[t, p, g], 1), :] for g in range(G)]
            V = jnp.concatenate(rows, axis=0)
            acc = acc + vals_ref[0, p] * jnp.take_along_axis(
                V, idx_ref[0, p].astype(jnp.int32), axis=1)
        o_ref[0] = acc

    def k_onehot(qb_ref, qo_ref, vals_ref, idx_ref, x_hbm, o_ref, win,
                 sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(0, S), :], win, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((G, 128), jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, 32), 1)
        for p in range(P):
            W32 = win[pl.ds(qb_ref[t, p], 32), :]
            sel = (iota == qo_ref[t, p, :][:, None]).astype(jnp.float32)
            V = jnp.dot(sel, W32, preferred_element_type=jnp.float32)
            acc = acc + vals_ref[0, p] * jnp.take_along_axis(
                V, idx_ref[0, p].astype(jnp.int32), axis=1)
        o_ref[0] = acc

    def timeit(fn, args):
        @jax.jit
        def loop(n, *a):
            def body(_, c):
                return c + jnp.sum(fn(*a)) * 1e-9
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        def t(n):
            t0 = time.perf_counter()
            s = float(loop(jnp.int32(n), *args))
            return time.perf_counter() - t0
        t(1)
        lo = min(t(5) for _ in range(3))
        hi = min(t(55) for _ in range(3))
        return (hi - lo) / 50

    try:
        f = mk(k_base, [qs])
        dt = timeit(f, (qs, vals, idx, xp))
        print(f"base  one-slice: {dt*1e3:.3f} ms "
              f"({NT*P*G*128/dt/1e9:.1f}G slot/s)")
    except Exception as e:
        print("base FAIL", repr(e)[:130])
    try:
        f = mk(k_slices, [qg])
        dt = timeit(f, (qg, vals, idx, xp))
        print(f"V1 16 slices:   {dt*1e3:.3f} ms "
              f"({NT*P*G*128/dt/1e9:.1f}G slot/s)")
    except Exception as e:
        print("V1 FAIL", repr(e)[:130])
    try:
        f = mk(k_onehot, [qbase, qoff])
        dt = timeit(f, (qbase, qoff, vals, idx, xp))
        print(f"V2 onehot mm32: {dt*1e3:.3f} ms "
              f"({NT*P*G*128/dt/1e9:.1f}G slot/s)")
    except Exception as e:
        print("V2 FAIL", repr(e)[:130])


if __name__ == "__main__":
    main()
