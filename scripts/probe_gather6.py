"""Probe 6 (round 4): primitives for a two-gather SELL variant.

(a) axis-0 take_along_axis: src [S,128], idx [G,128] -> [G,128]
(b) chained gathers: row-select (axis 0) then lane-shuffle (axis 1)
(c) in-kernel [128,128] transpose
(d) throughput of (b) repeated
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    S, G = 224, 16
    win = jnp.asarray(rng.standard_normal((S, 128)).astype(np.float32))
    R = jnp.asarray(rng.integers(0, S, (G, 128)).astype(np.int32))
    Cc = jnp.asarray(rng.integers(0, 128, (G, 128)).astype(np.int32))

    def try_(name, kernel, args, out_shape):
        try:
            out = pl.pallas_call(
                kernel, out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*args)
            print(name, "OK")
            return np.asarray(out)
        except Exception as e:
            print(name, "FAIL", repr(e)[:100])
            return None

    def kA(w, r, o):
        o[:] = jnp.take_along_axis(w[:], r[:], axis=0)
    out = try_("A axis0 [224,128]->[16,128]", kA, (win, R),
               jax.ShapeDtypeStruct((G, 128), jnp.float32))
    if out is not None:
        ref = np.take_along_axis(np.asarray(win), np.asarray(R), axis=0)
        print("   err", np.abs(out - ref).max())

    def kB(w, r, c, o):
        v = jnp.take_along_axis(w[:], r[:], axis=0)
        o[:] = jnp.take_along_axis(v, c[:], axis=1)
    out = try_("B chained axis0+axis1", kB, (win, R, Cc),
               jax.ShapeDtypeStruct((G, 128), jnp.float32))
    if out is not None:
        ref = np.take_along_axis(
            np.take_along_axis(np.asarray(win), np.asarray(R), axis=0),
            np.asarray(Cc), axis=1)
        print("   err", np.abs(out - ref).max())

    def kC(w, o):
        o[:] = w[0:128, :].T
    out = try_("C [128,128] transpose", kC, (win,),
               jax.ShapeDtypeStruct((128, 128), jnp.float32))
    if out is not None:
        print("   err", np.abs(out - np.asarray(win)[:128].T).max())

    # throughput: REPS chained two-gathers
    REPS = 64
    Rb = jnp.asarray(rng.integers(0, S, (REPS, G, 128)).astype(np.int32))
    Cb = jnp.asarray(rng.integers(0, 128, (REPS, G, 128)).astype(np.int32))

    def kD(w, rb, cb, o):
        acc = jnp.zeros((G, 128), jnp.float32)
        for p in range(REPS):
            v = jnp.take_along_axis(w[:], rb[p], axis=0)
            acc = acc + jnp.take_along_axis(v, cb[p], axis=1)
        o[:] = acc

    try:
        f = pl.pallas_call(
            kD, out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        jf = jax.jit(lambda: jnp.sum(f(win, Rb, Cb)))
        float(jf())
        t0 = time.perf_counter()
        N = 200
        for _ in range(N):
            s = float(jf())
        dt = (time.perf_counter() - t0) / N
        print(f"D {REPS} chained two-gathers: {dt*1e6:.1f} us "
              f"({REPS*G*128/dt/1e9:.2f}G picks/s out)")
    except Exception as e:
        print("D FAIL", repr(e)[:120])

    # axis-1 only baseline
    def kE(w, cb, o):
        acc = jnp.zeros((G, 128), jnp.float32)
        w16 = w[0:G, :]
        for p in range(REPS):
            acc = acc + jnp.take_along_axis(w16, cb[p], axis=1)
        o[:] = acc
    try:
        f = pl.pallas_call(
            kE, out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        jf = jax.jit(lambda: jnp.sum(f(win, Cb)))
        float(jf())
        t0 = time.perf_counter()
        N = 200
        for _ in range(N):
            s = float(jf())
        dt = (time.perf_counter() - t0) / N
        print(f"E {REPS} axis1 gathers:     {dt*1e6:.1f} us "
              f"({REPS*G*128/dt/1e9:.2f}G picks/s out)")
    except Exception as e:
        print("E FAIL", repr(e)[:120])


if __name__ == "__main__":
    main()
