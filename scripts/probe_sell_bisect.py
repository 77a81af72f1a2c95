"""Bisect the SellMat kernel fault on the real chip: build the kernel
up feature by feature. Run ONE step per process (a fault kills the TPU
worker): python scripts/probe_sell_bisect.py <step>.

Steps:
  a  grid + scalar-prefetch qs/winstart, x window as a plain VMEM
     input block (no DMA), int32 idx, single pass chunk
  b  a + int8 idx
  c  b + manual DMA of the window from ANY memory into scratch
  d  c + pass chunking (grid dim 2) with output accumulation
"""
import sys

import numpy as np


def main(step: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    G, S, P, nt = 8, 64, 6, 4
    Lp = S + G * nt
    xp = rng.standard_normal((Lp, 128)).astype(np.float32)
    vals = rng.standard_normal((nt, P, G, 128)).astype(np.float32)
    idx8 = rng.integers(0, 128, (nt, P, G, 128)).astype(np.int8)
    qs = rng.integers(0, S - G, (nt, P)).astype(np.int32)
    winstart = (np.arange(nt) * G).astype(np.int32)

    def ref():
        out = np.zeros((nt, G, 128), np.float32)
        for t in range(nt):
            win = xp[winstart[t]:winstart[t] + S]
            for p in range(P):
                V = win[qs[t, p]:qs[t, p] + G]
                out[t] += vals[t, p] * np.take_along_axis(
                    V, idx8[t, p].astype(np.int64), axis=1)
        return out

    idx = idx8.astype(np.int32) if step in ("a",) else idx8

    if step in ("a", "b"):
        # window delivered as a VMEM input block per tile
        wins = np.stack([xp[winstart[t]:winstart[t] + S]
                         for t in range(nt)])

        def kernel(qs_ref, win_ref, vals_ref, idx_ref, o_ref):
            t = pl.program_id(0)
            acc = jnp.zeros((G, 128), jnp.float32)
            for p in range(P):
                V = win_ref[0, pl.ds(qs_ref[t, p], G), :]
                picked = jnp.take_along_axis(
                    V, idx_ref[0, p].astype(jnp.int32), axis=1)
                acc = acc + vals_ref[0, p] * picked
            o_ref[0] = acc

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, S, 128), lambda t, q: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, G, 128), lambda t, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, G, 128), lambda t, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, 128), lambda t, q: (t, 0, 0),
                                   memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nt, G, 128),
                                                   jnp.float32),
            grid_spec=grid_spec)(jnp.asarray(qs), jnp.asarray(wins),
                                 jnp.asarray(vals), jnp.asarray(idx))

    elif step == "c":
        def kernel(ws_ref, qs_ref, vals_ref, idx_ref, x_hbm, o_ref,
                   win, sem):
            t = pl.program_id(0)
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws_ref[t], S), :], win, sem)
            dma.start()
            dma.wait()
            acc = jnp.zeros((G, 128), jnp.float32)
            for p in range(P):
                V = win[pl.ds(qs_ref[t, p], G), :]
                picked = jnp.take_along_axis(
                    V, idx_ref[0, p].astype(jnp.int32), axis=1)
                acc = acc + vals_ref[0, p] * picked
            o_ref[0] = acc

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, P, G, 128), lambda t, w, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, G, 128), lambda t, w, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, G, 128), lambda t, w, q: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nt, G, 128),
                                                   jnp.float32),
            grid_spec=grid_spec)(jnp.asarray(winstart), jnp.asarray(qs),
                                 jnp.asarray(vals), jnp.asarray(idx),
                                 jnp.asarray(xp))

    elif step == "d":
        PC = 3
        npc = P // PC

        def kernel(ws_ref, qs_ref, vals_ref, idx_ref, x_hbm, o_ref,
                   win, sem):
            t = pl.program_id(0)
            pc = pl.program_id(1)

            @pl.when(pc == 0)
            def _():
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(ws_ref[t], S), :], win, sem)
                dma.start()
                dma.wait()

            acc = jnp.zeros((G, 128), jnp.float32)
            for p in range(PC):
                V = win[pl.ds(qs_ref[t, pc * PC + p], G), :]
                picked = jnp.take_along_axis(
                    V, idx_ref[0, p].astype(jnp.int32), axis=1)
                acc = acc + vals_ref[0, p] * picked

            @pl.when(pc == 0)
            def _():
                o_ref[0] = acc

            @pl.when(pc != 0)
            def _():
                o_ref[0] = o_ref[0] + acc

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nt, npc),
            in_specs=[
                pl.BlockSpec((1, PC, G, 128),
                             lambda t, pc, w, q: (t, pc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PC, G, 128),
                             lambda t, pc, w, q: (t, pc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, G, 128),
                                   lambda t, pc, w, q: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nt, G, 128),
                                                   jnp.float32),
            grid_spec=grid_spec)(jnp.asarray(winstart), jnp.asarray(qs),
                                 jnp.asarray(vals), jnp.asarray(idx),
                                 jnp.asarray(xp))
    elif step in ("e", "f"):
        # the real small-case geometry: S odd (non-multiple-of-8
        # scratch rows), Lp == S, single tile, unaligned q offsets
        G2, S2, P2, nt2 = 8, (24 if step == "f" else 23), 14, 1
        Lp2 = S2
        xp2 = rng.standard_normal((Lp2, 128)).astype(np.float32)
        vals2 = rng.standard_normal((nt2, P2, G2, 128)).astype(np.float32)
        idx2 = rng.integers(0, 128, (nt2, P2, G2, 128)).astype(np.int8)
        qs2 = rng.integers(1, S2 - G2, (nt2, P2)).astype(np.int32)
        ws2 = np.zeros(nt2, np.int32)

        def kernel(ws_ref, qs_ref, vals_ref, idx_ref, x_hbm, o_ref,
                   win, sem):
            t = pl.program_id(0)
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(ws_ref[t], S2), :], win, sem)
            dma.start()
            dma.wait()
            acc = jnp.zeros((G2, 128), jnp.float32)
            for p in range(P2):
                V = win[pl.ds(qs_ref[t, p], G2), :]
                picked = jnp.take_along_axis(
                    V, idx_ref[0, p].astype(jnp.int32), axis=1)
                acc = acc + vals_ref[0, p] * picked
            o_ref[0] = acc

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nt2,),
            in_specs=[
                pl.BlockSpec((1, P2, G2, 128),
                             lambda t, w, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P2, G2, 128),
                             lambda t, w, q: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, G2, 128),
                                   lambda t, w, q: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S2, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((nt2, G2, 128),
                                                   jnp.float32),
            grid_spec=grid_spec)(jnp.asarray(ws2), jnp.asarray(qs2),
                                 jnp.asarray(vals2), jnp.asarray(idx2),
                                 jnp.asarray(xp2))
        got = np.asarray(out)
        refv = np.zeros((nt2, G2, 128), np.float32)
        for t in range(nt2):
            for p in range(P2):
                V = xp2[qs2[t, p]:qs2[t, p] + G2]
                refv[t] += vals2[t, p] * np.take_along_axis(
                    V, idx2[t, p].astype(np.int64), axis=1)
        print(f"step e: OK err={np.abs(got - refv).max():.2e}",
              flush=True)
        return

    else:
        raise SystemExit(f"unknown step {step}")

    got = np.asarray(out)
    err = np.abs(got - ref()).max()
    print(f"step {step}: OK err={err:.2e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "a")
