"""Probe 3: tpu.dynamic_gather throughput + axis=0 retry."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # retry axis=0 same-shape (earlier failure may have been transient)
    for S, L in ((8, 128), (256, 128), (512, 256)):
        x = jnp.asarray(rng.standard_normal((S, L)).astype(np.float32))
        ia = jnp.asarray(rng.integers(0, S, size=(S, L)).astype(np.int32))

        def k4(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
        try:
            out = pl.pallas_call(
                k4, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, ia)
            ref = np.take_along_axis(np.asarray(x), np.asarray(ia), axis=0)
            print(f"axis=0 ({S},{L}): OK",
                  float(np.abs(np.asarray(out) - ref).max()))
        except Exception as e:
            print(f"axis=0 ({S},{L}): FAIL", repr(e)[:120])

    # throughput: repeated axis=1 gathers inside one kernel
    S, L, REPS = 512, 128, 16
    x = jnp.asarray(rng.standard_normal((S, L)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, size=(REPS, S, L)).astype(np.int32))

    def kgather(x_ref, i_ref, o_ref):
        acc = jnp.zeros((S, L), jnp.float32)
        for t in range(REPS):
            acc = acc + jnp.take_along_axis(x_ref[:], i_ref[t], axis=1)
        o_ref[:] = acc

    gath = pl.pallas_call(
        kgather, out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x, idx, iters):
        def body(_, v):
            return gath(v * np.float32(1e-3), idx)
        return jnp.sum(lax.fori_loop(0, iters, body, x))

    def timed(it):
        t0 = time.perf_counter()
        float(loop(x, idx, jnp.int32(it)))
        return time.perf_counter() - t0
    timed(1)
    lo = min(timed(10) for _ in range(2))
    hi = min(timed(110) for _ in range(2))
    dt = max(hi - lo, 1e-9) / 100
    n_elem = REPS * S * L
    print(f"dynamic_gather axis=1: {n_elem/dt:.3e} elem/s "
          f"({dt*1e6/REPS:.2f} us per {S}x{L} gather)")


if __name__ == "__main__":
    main()
