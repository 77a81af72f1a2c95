"""Probe: irregular-SpMV candidate kernels on the real chip.

Measures, with dispatch-cancelling delta timing (bench.py method):
  A. ELL gather SpMV        y = sum(vals * x[cols], 1)
  B. sorted-window ELL      same, but cols pre-sorted by RCM so each
                            row's cols live in a narrow window
  C. take_along_axis form   windowed relative cols within tiles
  D. one-hot panel+lane     two-stage MXU/VPU gather replacement
on a 3-D Laplacian (27-point, n ~ 1.2M) whose RCM bandwidth ~ n^{2/3}
is far too wide for BandMat (the VERDICT r2 "irregular" gap).
"""
import time
import numpy as np
import scipy.sparse as sp


def lap3d(m, dtype=np.float32, stencil27=True):
    n = m ** 3
    idx = np.arange(n).reshape(m, m, m)
    rows, cols, vals = [], [], []
    offs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1)] if stencil27 else \
        [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
         (0, 0, 1), (0, 0, -1)]
    for o in offs:
        sl_src = tuple(slice(max(0, -d), m - max(0, d)) for d in o)
        sl_dst = tuple(slice(max(0, d), m + min(0, d)) for d in o)
        r = idx[sl_src].ravel()
        c = idx[sl_dst].ravel()
        v = np.full(r.shape, -1.0 if any(o) else 26.0, dtype)
        rows.append(r); cols.append(c); vals.append(v)
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    return A


def to_ell(A, dtype=np.float32):
    m = A.shape[0]
    rn = np.diff(A.indptr)
    K = int(rn.max())
    cols = np.zeros((m, K), np.int32)
    vals = np.zeros((m, K), dtype)
    for k in range(K):
        has = rn > k
        cols[has, k] = A.indices[A.indptr[:-1][has] + k]
        vals[has, k] = A.data[A.indptr[:-1][has] + k]
    return cols, vals


def timed(fn, lo=3, hi=23):
    t0 = time.perf_counter(); fn(lo); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); fn(hi); t_hi = time.perf_counter() - t0
    t0 = time.perf_counter(); fn(lo); t_lo = min(t_lo, time.perf_counter() - t0)
    t0 = time.perf_counter(); fn(hi); t_hi = min(t_hi, time.perf_counter() - t0)
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    m = 104                      # n = 1.12M, 27-pt: ~30M nnz
    A = lap3d(m)
    n = A.shape[0]
    print(f"n={n}, nnz={A.nnz}, avg row {A.nnz/n:.1f}")
    # scramble then RCM (the honest pipeline: matrix arrives unordered)
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    As = A[p][:, p]
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    perm = reverse_cuthill_mckee(As, symmetric_mode=True)
    Ar = As[perm][:, perm].tocsr()
    bw = int(np.abs(Ar.indices - np.repeat(np.arange(n), np.diff(Ar.indptr))).max())
    print(f"RCM bandwidth = {bw} (BandMat tiles would need T+2B = {128+2*bw})")

    cols, vals = to_ell(Ar)
    K = cols.shape[1]
    x = rng.standard_normal(n).astype(np.float32)
    xd = jnp.asarray(x)
    cd = jnp.asarray(cols)
    vd = jnp.asarray(vals)
    y_ref = Ar @ x

    @jax.jit
    def ell(cd, vd, xv, iters):
        def body(_, v):
            return jnp.sum(vd * v[cd], axis=1) * np.float32(0.05)
        return jnp.sum(lax.fori_loop(0, iters, body, xv))

    out = jnp.sum(vd * xd[cd], axis=1)
    err = float(np.linalg.norm(np.asarray(out) - y_ref) / np.linalg.norm(y_ref))
    print("ELL err", err)
    dt = timed(lambda it: float(ell(cd, vd, xd, jnp.int32(it))))
    traffic = 4.0 * (2 * n * K + 2 * n)
    print(f"A: ELL gather  {dt*1e3:.2f} ms  {A.nnz/dt:.3e} nnz/s  "
          f"{traffic/dt/1e9:.1f} GB/s-equiv")

    # C: windowed relative cols, take_along_axis on padded windows
    T = 1024
    nt = -(-n // T)
    npad = nt * T
    cpad = np.zeros((npad, K), np.int32)
    vpad = np.zeros((npad, K), np.float32)
    cpad[:n] = cols; vpad[:n] = vals
    ct = cpad.reshape(nt, T, K)
    starts = ct.min(axis=(1, 2)).astype(np.int32)
    W = int((ct.max(axis=(1, 2)) - starts).max()) + 1
    W = -(-W // 128) * 128
    print(f"T={T}: window W={W} floats = {W*4/1024:.0f} KB")
    rel = ct - starts[:, None, None]

    reld = jnp.asarray(rel)
    vtd = jnp.asarray(vpad.reshape(nt, T, K))
    std = jnp.asarray(starts)

    @jax.jit
    def windowed(reld, vtd, std, xv, iters):
        xp = jnp.concatenate([xv, jnp.zeros(W + npad - n, xv.dtype)])
        def body(_, v):
            vp = jnp.concatenate([v, jnp.zeros(W + npad - n, v.dtype)])
            def per_tile(st, rc, vv):
                win = lax.dynamic_slice(vp, (st,), (W,))
                return jnp.sum(vv * win[rc], axis=1)
            y = jax.vmap(per_tile)(std, reld, vtd)
            return y.reshape(-1)[:n] * np.float32(0.05)
        return jnp.sum(lax.fori_loop(0, iters, body, xv))

    out = None
    try:
        xpad = jnp.concatenate([xd, jnp.zeros(W + npad - n, xd.dtype)])
        def per_tile(st, rc, vv):
            win = lax.dynamic_slice(xpad, (st,), (W,))
            return jnp.sum(vv * win[rc], axis=1)
        out = jax.vmap(per_tile)(std, reld, vtd).reshape(-1)[:n]
        err = float(np.linalg.norm(np.asarray(out) - y_ref) / np.linalg.norm(y_ref))
        print("windowed err", err)
        dt = timed(lambda it: float(windowed(reld, vtd, std, xd, jnp.int32(it))))
        print(f"C: windowed vmap-gather  {dt*1e3:.2f} ms  {A.nnz/dt:.3e} nnz/s")
    except Exception as e:
        print("C failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
