"""SellMat on the real chip: correctness + throughput on the RCM'd
3-D 27-point Laplacian (the BandMat-infeasible irregular case)."""
import os
import sys
import time
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from probe_gather import lap3d, timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from petsctpu.mat.sell import sell_from_scipy, sell_plan_stats

    m = 104
    A = lap3d(m)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    As = A[p][:, p]
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    perm = reverse_cuthill_mckee(As, symmetric_mode=True)
    Ar = As[perm][:, perm].tocsr()
    Ar.sum_duplicates()

    for G in (32, 64):
        P, K, S, slop = sell_plan_stats(Ar, G)
        print(f"G={G}: P={P} K={K} S={S} slop={slop:.2f} "
              f"vmem(win)={S*128*4/1024:.0f}KB "
              f"vmem(vals+idx)={P*G*128*5/1024:.0f}KB")

    G = 64
    t0 = time.time()
    M = sell_from_scipy(Ar, G=G, max_span_rows=8192)
    print(f"build {time.time()-t0:.1f}s")
    x = rng.standard_normal(n).astype(np.float32)
    xd = jnp.asarray(x)
    y = np.asarray(M.mult(xd))
    yref = Ar @ x
    err = np.abs(y - yref).max() / np.abs(yref).max()
    print("rel err:", err)
    assert err < 1e-4, err

    @jax.jit
    def chain(M, v, iters):
        def body(_, v):
            return M.mult(v) * np.float32(0.05)
        return jnp.sum(lax.fori_loop(0, iters, body, v))

    def t(it):
        t0 = time.perf_counter()
        s = float(chain(M, xd, jnp.int32(it)))
        assert np.isfinite(s)
        return time.perf_counter() - t0
    t(1)
    lo = min(t(5) for _ in range(3))
    hi = min(t(105) for _ in range(3))
    dt = max(hi - lo, 1e-9) / 100
    nnz = Ar.nnz
    slots = M.vals.shape[0] * M.npass * G * 128
    traffic = slots * 5.0 + 4.0 * 2 * n + M.nt * M.S * 128 * 4.0
    ideal = nnz * 8.0 + 2 * 4.0 * n
    print(f"SellMat SpMV: {dt*1e3:.3f} ms  {nnz/dt:.3e} nnz/s")
    print(f"  streamed {traffic/dt/1e9:.0f} GB/s of its own traffic "
          f"({traffic/1e6:.0f} MB/mult)")
    print(f"  vs ideal-CSR roofline ({ideal/1e6:.0f} MB): "
          f"{ideal/819e9/dt*100:.0f}% of peak-BW ideal time")


if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    main()
