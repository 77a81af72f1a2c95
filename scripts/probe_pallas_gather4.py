"""Probe 4: remaining primitives for the clustered-SELL kernel:
dynamic sublane slice of VMEM, lane-concat, [G,384] gather, int16 idx."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    S, G = 64, 16
    win = jnp.asarray(rng.standard_normal((S, 128)).astype(np.float32))
    t0 = jnp.asarray([[3]], dtype=np.int32)
    idx = jnp.asarray(rng.integers(0, 384, size=(G, 384)).astype(np.int32))
    idx16 = idx.astype(jnp.int16)

    def kernel(t_ref, win_ref, idx_ref, o_ref):
        t = t_ref[0, 0]
        W2 = win_ref[pl.ds(t, G + 2), :]            # dynamic sublane slice
        SRC = jnp.concatenate([W2[0:G], W2[1:G + 1], W2[2:G + 2]], axis=1)
        o_ref[:] = jnp.take_along_axis(SRC, idx_ref[:], axis=1)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G, 384), jnp.float32),
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t0, win, idx)
        w = np.asarray(win)
        W2 = w[3:3 + G + 2]
        SRC = np.concatenate([W2[0:G], W2[1:G + 1], W2[2:G + 2]], axis=1)
        ref = np.take_along_axis(SRC, np.asarray(idx), axis=1)
        print("dyn-slice + concat + [G,384] gather: OK",
              float(np.abs(np.asarray(out) - ref).max()))
    except Exception as e:
        print("combo kernel: FAIL", repr(e)[:300])

    def kernel16(t_ref, win_ref, idx_ref, o_ref):
        t = t_ref[0, 0]
        W2 = win_ref[pl.ds(t, G + 2), :]
        SRC = jnp.concatenate([W2[0:G], W2[1:G + 1], W2[2:G + 2]], axis=1)
        o_ref[:] = jnp.take_along_axis(SRC, idx_ref[:].astype(jnp.int32),
                                       axis=1)

    try:
        out = pl.pallas_call(
            kernel16,
            out_shape=jax.ShapeDtypeStruct((G, 384), jnp.float32),
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t0, win, idx16)
        print("int16 idx (cast in kernel): OK",
              float(np.abs(np.asarray(out) - ref).max()))
    except Exception as e:
        print("int16 idx: FAIL", repr(e)[:300])


if __name__ == "__main__":
    main()
