"""Probe: which gather forms does Mosaic lower on this TPU?"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W, T, K = 4096, 256, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(W).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, W, size=(T, K)).astype(np.int32))
    ref = np.asarray(x)[np.asarray(idx)]

    def try_(name, kernel, *args, out_shape):
        try:
            out = pl.pallas_call(
                kernel, out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            err = float(np.abs(np.asarray(out) - ref).max())
            print(f"{name}: OK err={err:.2e}")
            return True
        except Exception as e:
            print(f"{name}: FAIL {repr(e)[:160]}")
            return False

    osh = jax.ShapeDtypeStruct((T, K), jnp.float32)

    def k1(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[i_ref[:]]
    try_("direct x[idx] (1-D x)", k1, x, idx, out_shape=osh)

    def k2(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)
    try_("jnp.take axis=0 (1-D x)", k2, x, idx, out_shape=osh)

    # 2-D x: gather rows (sublanes) with per-lane indices via
    # take_along_axis on axis 0
    x2 = x.reshape(W // 128, 128)
    i_row = idx.reshape(-1) // 128     # which row
    i_lane = idx.reshape(-1) % 128

    def k3(x_ref, i_ref, o_ref):
        # gather along lanes within each row: [R, 128] take_along_axis ax=1
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    xl = x.reshape(32, 128)
    il = jnp.asarray(rng.integers(0, 128, size=(32, 128)).astype(np.int32))
    refl = np.take_along_axis(np.asarray(xl), np.asarray(il), axis=1)
    try:
        out = pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xl, il)
        err = float(np.abs(np.asarray(out) - refl).max())
        print(f"take_along_axis axis=1 (lane shuffle): OK err={err:.2e}")
    except Exception as e:
        print(f"take_along_axis axis=1: FAIL {repr(e)[:160]}")

    def k4(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    ia = jnp.asarray(rng.integers(0, 32, size=(32, 128)).astype(np.int32))
    refa = np.take_along_axis(np.asarray(xl), np.asarray(ia), axis=0)
    try:
        out = pl.pallas_call(
            k4, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xl, ia)
        err = float(np.abs(np.asarray(out) - refa).max())
        print(f"take_along_axis axis=0 (sublane gather): OK err={err:.2e}")
    except Exception as e:
        print(f"take_along_axis axis=0: FAIL {repr(e)[:160]}")


if __name__ == "__main__":
    main()
