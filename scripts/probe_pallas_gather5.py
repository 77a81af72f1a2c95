"""Probe 5: bisect the failing combo."""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    G = 16

    def run(name, kernel, args, out_shape, smem_first=False):
        specs = []
        for k, a in enumerate(args):
            if smem_first and k == 0:
                specs.append(pl.BlockSpec((1, 1), memory_space=pltpu.SMEM))
            else:
                specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        try:
            out = pl.pallas_call(kernel, out_shape=out_shape,
                                 in_specs=specs,
                                 out_specs=pl.BlockSpec(
                                     memory_space=pltpu.VMEM))(*args)
            print(name, "OK")
            return np.asarray(out)
        except Exception as e:
            print(name, "FAIL", repr(e)[:120])
            return None

    # A: [G, 384] gather alone
    src = jnp.asarray(rng.standard_normal((G, 384)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 384, size=(G, 384)).astype(np.int32))

    def kA(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
    out = run("A [G,384] gather", kA, (src, idx),
              jax.ShapeDtypeStruct((G, 384), jnp.float32))
    if out is not None:
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        print("   err", float(np.abs(out - ref).max()))

    # B: dynamic sublane slice alone
    S = 64
    win = jnp.asarray(rng.standard_normal((S, 128)).astype(np.float32))
    t0 = jnp.asarray([[3]], dtype=np.int32)

    def kB(t_ref, w_ref, o_ref):
        o_ref[:] = w_ref[pl.ds(t_ref[0, 0], G), :]
    out = run("B dyn sublane slice", kB, (t0, win),
              jax.ShapeDtypeStruct((G, 128), jnp.float32), smem_first=True)
    if out is not None:
        print("   err", float(np.abs(out - np.asarray(win)[3:3 + G]).max()))

    # C: static concat of shifted views
    def kC(w_ref, o_ref):
        W2 = w_ref[0:G + 2, :]
        o_ref[:] = jnp.concatenate([W2[0:G], W2[1:G + 1], W2[2:G + 2]],
                                   axis=1)
    out = run("C concat shifted views", kC, (win,),
              jax.ShapeDtypeStruct((G, 384), jnp.float32))
    if out is not None:
        w = np.asarray(win)
        ref = np.concatenate([w[0:G], w[1:G + 1], w[2:G + 2]], axis=1)
        print("   err", float(np.abs(out - ref).max()))

    # D: gather on 3x128 lanes but idx bounded per 128-block? replicate A
    # with idx only within each 128 block
    idx_blk = np.concatenate([rng.integers(0, 384, size=(G, 128))
                              for _ in range(3)], axis=1).astype(np.int32)

    def kD(s_ref, i_ref, o_ref):
        a = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
        o_ref[:] = a[:, 0:128] + a[:, 128:256] + a[:, 256:384]
    out = run("D gather + block sum", kD, (src, jnp.asarray(idx_blk)),
              jax.ShapeDtypeStruct((G, 128), jnp.float32))


if __name__ == "__main__":
    main()
