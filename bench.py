"""Benchmark: SpMV throughput vs HBM roofline on one chip.

Prints ONE JSON line: the fraction of the HBM-bandwidth roofline
achieved by the ELL SpMV kernel on a large 2-D Poisson matrix.
BASELINE.json target: >= 70% of roofline, so vs_baseline =
achieved_fraction / 0.70 (>1 beats target).

Method: N chained SpMVs run INSIDE one jitted lax.fori_loop (each
iteration rescaled by 1/8 to stay bounded), with a dynamic trip count
so one executable serves two timed runs; throughput is computed from
the time DIFFERENCE between the long and short runs, cancelling the
per-dispatch tunnel/dispatch overhead (which dominates through the
axon relay). Completion is forced by fetching a scalar, not
block_until_ready (which does not block through the relay).

Roofline model (fp32, ELL width K): compulsory traffic per mult =
vals(4nK) + cols(4nK) + x(4n) + y(4n) bytes.
"""

from __future__ import annotations

import json
import time

import numpy as np


def hbm_bandwidth_gbs() -> float:
    import jax
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v4" in kind:
        return 1228.0
    if "v5p" in kind:
        return 2765.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def build_stencil_laplacian(m: int, dtype=np.float32):
    """5-point variable-coefficient stencil on an m×m grid, built
    directly in DIA/stencil layout (what the DMDA layer produces)."""
    import jax.numpy as jnp
    from petsctpu.mat.stencil import StencilMat

    C = np.zeros((5, m, m), dtype)
    C[0] = 4.0
    C[1, 1:, :] = -1.0    # (-1, 0)
    C[2, :-1, :] = -1.0   # (+1, 0)
    C[3, :, 1:] = -1.0    # (0, -1)
    C[4, :, :-1] = -1.0   # (0, +1)
    offsets = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
    return StencilMat(jnp.asarray(C), offsets, (m, m))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    m = 4096                       # 16.8M rows, ~84M nnz, ~470MB working set
    n = m * m
    Ad = build_stencil_laplacian(m)
    K = len(Ad.offsets)
    # grid-shaped operand: StencilMat.mult is shape-preserving, so the
    # chain never pays the flat<->grid relayout copy (measured ~25% of
    # SpMV time when iterating on a flat carry)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, m))
                    .astype(np.float32))

    @jax.jit
    def chain(M, v, iters):
        def body(_, v):
            return M.mult(v) * np.float32(0.125)   # keep ‖v‖ bounded
        return jnp.sum(lax.fori_loop(0, iters, body, v))

    def timed(iters):
        t0 = time.perf_counter()
        s = float(chain(Ad, x, jnp.int32(iters)))   # scalar fetch = sync
        dt = time.perf_counter() - t0
        assert np.isfinite(s), f"bench produced {s}"
        return dt

    timed(1)                                        # compile + warm
    n_lo, n_hi = 100, 2100       # ≥200 ms of work in the delta
    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    dt = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)

    # STREAM-triad probe measured the same way — the reference's own
    # roofline denominator methodology (src/benchmarks/streams/).
    # Arrays must dwarf on-chip memory or the loop runs out of VMEM at
    # multi-TB/s and the "roofline" is fiction: use 256 MB operands.
    ns = 64 * 1024 * 1024
    a = jnp.asarray(np.random.default_rng(1).standard_normal(ns)
                    .astype(np.float32))
    v0 = jnp.asarray(np.random.default_rng(2).standard_normal(ns)
                     .astype(np.float32))

    @jax.jit
    def triad(a, v, iters):
        def body(_, v):
            return a + np.float32(0.5) * v          # read a, v; write out
        return jnp.sum(lax.fori_loop(0, iters, body, v))

    def timed_triad(iters):
        t0 = time.perf_counter()
        float(triad(a, v0, jnp.int32(iters)))
        return time.perf_counter() - t0

    timed_triad(1)
    m_lo, m_hi = 20, 320
    tt_lo = min(timed_triad(m_lo) for _ in range(3))
    tt_hi = min(timed_triad(m_hi) for _ in range(3))
    dt_triad = max(tt_hi - tt_lo, 1e-9) / (m_hi - m_lo)
    stream_gbs = 3.0 * 4.0 * ns / dt_triad / 1e9

    # ---- irregular SpMV: a scrambled 3-D 27-point Laplacian after
    # RCM — the case the reference serves with MatMult_SeqAIJ
    # (aij.c:1173). Routed through the format factory's -mat_type auto
    # (mat/factory.py): the plan evaluates orderings by its own SELL
    # pass-count cost model and recovers the hidden structured grid
    # (mat/griddetect.py), so the chosen layout is DIA stencil streams
    # with values identical. Reported as detail next to the headline.
    irr = {}
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        from petsctpu.mat.factory import mat_from_options

        mi = 64
        e = np.ones(mi)
        T1 = sp.diags([e[:-1], e, e[:-1]], [-1, 0, 1])
        A3 = sp.kron(sp.kron(T1, T1), T1).tocsr()      # 27-point
        ni = A3.shape[0]
        rngp = np.random.default_rng(5)
        pp = rngp.permutation(ni)
        A3 = A3[pp][:, pp]
        permr = reverse_cuthill_mckee(A3, symmetric_mode=True)
        A3 = A3[permr][:, permr].tocsr()
        A3.sum_duplicates()
        A3.data = rngp.standard_normal(A3.nnz).astype(np.float32)
        t0 = time.perf_counter()
        Ms, perm_i = mat_from_options(A3, mat_type="auto",
                                      dtype=np.float32)
        plan_s = time.perf_counter() - t0
        xi = jnp.asarray(rngp.standard_normal(ni).astype(np.float32))

        @jax.jit
        def chain_irr(M, v, iters, salt):
            def body(_, v):
                return M.mult(v) * np.float32(0.05)
            return jnp.sum(lax.fori_loop(0, iters, body, v + salt))

        salt_irr = iter(range(1, 100))

        def timed_irr(iters):
            # salted + wide window: each SpMV is ~80 us, so a 100-it
            # delta (~8 ms) sat inside the relay's ±5 ms dispatch
            # jitter and read 0.76-0.91 of roofline across runs
            t0 = time.perf_counter()
            s = float(chain_irr(Ms, xi, jnp.int32(iters),
                                jnp.float32(next(salt_irr) * 1e-6)))
            assert np.isfinite(s)
            return time.perf_counter() - t0

        timed_irr(1)
        ti_lo = min(timed_irr(5) for _ in range(3))
        ti_hi = min(timed_irr(2005) for _ in range(3))
        dti = max(ti_hi - ti_lo, 1e-9) / 2000
        irr = {"irregular_nnz_per_s": f"{A3.nnz / dti:.3e}",
               "irregular_ms": round(dti * 1e3, 4),
               "irregular_frac_ideal_csr":
                   round(A3.nnz * 8.0 / dti / 1e9
                         / max(stream_gbs, hbm_bandwidth_gbs()), 4),
               "irregular_n": ni,
               "irregular_plan_s": round(plan_s, 2),
               "irregular_format":
                   f"auto -> {type(Ms).__name__} (scrambled 3-D "
                   "27-point; grid recovered, values identical)"}
    except Exception as ex:                             # pragma: no cover
        irr = {"irregular_error": repr(ex)[:200]}

    # ---- BASELINE configs 2-4 (compact, dispatch-corrected) ----
    cfgs = {}
    try:
        import scipy.sparse as sp

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.pc import make_pc

        def timed_solve(Ad, bj, pc, ksp_type, lo_its, hi_its, rtol=1e-5):
            """Honest per-iteration cost: the timing runs use an
            unreachable tolerance so the while_loop executes exactly
            maxits iterations (a converged run would exit early and
            the delta would undercount); the converged-iteration count
            is measured separately at the stated rtol."""
            r = ksp_solve(Ad, bj, pc=pc, ksp_type=ksp_type,
                          rtol=rtol, atol=1e-30, maxits=hi_its)
            its, reason = int(r.its), int(r.reason)

            salt_i = iter(range(1, 1000))

            def run(mx):
                # fresh rhs each call — the relay memoizes identical
                # (executable, args) dispatches
                bs = bj * np.float32(1.0 + next(salt_i) * 1e-6)
                t0 = time.perf_counter()
                rr = ksp_solve(Ad, bs, pc=pc, ksp_type=ksp_type,
                               rtol=1e-30, atol=1e-38, maxits=mx)
                _ = float(rr.rnorm)
                return time.perf_counter() - t0
            run(lo_its)
            run(hi_its)
            tl = min(run(lo_its) for _ in range(2))
            th = min(run(hi_its) for _ in range(2))
            return max(th - tl, 1e-9) / (hi_its - lo_its), its, reason

        # config 2: ex45-style 3-D 7-point Poisson, CG + BJacobi(ILU0).
        # Default-fast paths: SELL Pallas SpMV on the natural-order
        # operator (identical values, no reordering) and the auto
        # (band2) MXU triangular solves on per-block RCM'd ILU factors
        # (-sub_pc_factor_mat_ordering_type rcm — the reference's own
        # tuning knob; iteration count matches the natural/level path).
        mi = 48
        e = np.ones(mi)
        T1 = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
        I1 = sp.eye(mi)
        A45 = (sp.kron(sp.kron(T1, I1), I1) + sp.kron(sp.kron(I1, T1), I1)
               + sp.kron(sp.kron(I1, I1), T1)).tocsr().astype(np.float32)
        Ad45 = aij_from_scipy(A45, dtype=np.float32)
        try:
            from petsctpu.mat.factory import mat_from_options
            Aop45, p45 = mat_from_options(A45, mat_type="auto",
                                          dtype=np.float32)
            if p45 is not None:        # keep PC/operator index spaces equal
                Aop45 = Ad45
        except Exception:
            Aop45 = Ad45
        pc45 = make_pc("bjacobi", A=Ad45, A_host=A45,
                       options=Options({
                           "pc_bjacobi_blocks": 8, "sub_pc_type": "ilu",
                           "sub_pc_factor_mat_ordering_type": "rcm"}))
        b45 = jnp.asarray(np.random.default_rng(1)
                          .standard_normal(mi ** 3).astype(np.float32))
        per_it, its, reason = timed_solve(Aop45, b45, pc45, "cg", 5, 45)
        cfgs["ex45_cg_bjacobi_ms_per_it"] = round(per_it * 1e3, 3)
        cfgs["ex45_its_to_rtol1e-5"] = its

        # config 3: BAIJ bs=3 elasticity blocked SpMV (fmt auto routes
        # the forward SpMV through the scalar SELL kernel — the TPU
        # analog of the reference's per-bs unrolled MatMult_SeqBAIJ_N,
        # baij2.c:387)
        from petsctpu.mat.bsr import baij_from_scipy_bsr
        from petsctpu.models.elasticity import ex56_system
        A56, b56, _ = ex56_system(19, 1e-3, dtype=np.float32)
        Ab = baij_from_scipy_bsr(A56, bs=3, dtype=np.float32, fmt="auto")
        xb = jnp.asarray(np.random.default_rng(2)
                         .standard_normal(A56.shape[0]).astype(np.float32))

        @jax.jit
        def chain_b(M, v, iters, salt):
            def body(_, v):
                return M.mult(v) * np.float32(0.05)
            return jnp.sum(lax.fori_loop(0, iters, body, v + salt))

        salt_i = iter(range(1, 1000))

        def tb(it):
            # fresh salt each call: the relay memoizes identical
            # (executable, args) dispatches, which collapses repeated
            # timing runs to ~0 and can make the delta negative
            t0 = time.perf_counter()
            s = float(chain_b(Ab, xb, jnp.int32(it),
                              jnp.float32(next(salt_i) * 1e-6)))
            assert np.isfinite(s)
            return time.perf_counter() - t0
        tb(1)
        # delta must dwarf the ~±5 ms relay dispatch jitter: 2000
        # extra SpMVs (~60 ms) rather than 100 (~3 ms, which went
        # NEGATIVE under jitter in round 5)
        bl = min(tb(5) for _ in range(3))
        bh = min(tb(2005) for _ in range(3))
        dtb = max((bh - bl) / 2000, 1e-9)
        cfgs["baij_bs3_spmv_nnz_per_s"] = f"{A56.nnz / dtb:.3e}"

        # config 4: GAMG on 2-D Poisson — setup + per-iteration
        m4 = 256
        from petsctpu.models import laplacian_2d
        A4 = laplacian_2d(m4, m4, dtype=np.float32).tocsr()
        # outer CG operator through -mat_type auto (the 5-point 256²
        # Poisson is natural-banded -> BandMat streams, no perm)
        from petsctpu.mat.factory import mat_from_options
        Aop4, p4 = mat_from_options(A4, mat_type="auto",
                                    dtype=np.float32)
        if p4 is not None:
            Aop4 = aij_from_scipy(A4, dtype=np.float32)
        t0 = time.perf_counter()
        pc4 = make_pc("gamg", A=Aop4, A_host=A4,
                      options=Options({"pc_gamg_coarse_eq_limit": 64}))
        cfgs["gamg_setup_s"] = round(time.perf_counter() - t0, 2)
        cfgs["gamg_outer_format"] = type(Aop4).__name__
        b4 = jnp.asarray(np.random.default_rng(3)
                         .standard_normal(m4 * m4).astype(np.float32))
        # per-iteration cost via K whole solves scanned inside ONE
        # dispatch (12 fixed its each at an unreachable rtol; fp32
        # GAMG-CG hits nan ~it 20 so longer single solves exit early,
        # and a 10-iteration host-level delta sits inside the relay's
        # ±5 ms dispatch jitter — both bit round 5)
        from petsctpu.ksp.cg import solve_cg
        from petsctpu.ksp.common import KSPConfig as _KC
        cfg4 = _KC(rtol=1e-30, atol=1e-38, maxits=12)
        x04 = jnp.zeros_like(b4)

        @jax.jit
        def chain4(b, salts):
            def step(acc, s):
                res = solve_cg(Aop4, b * (1 + s), x04, pc4, cfg4)
                return acc + res.x[0], None
            return lax.scan(step, jnp.float32(0), salts)[0]

        def t4(K):
            salts = jnp.asarray(np.arange(1, K + 1, dtype=np.float32)
                                * np.float32(1e-6))
            t0 = time.perf_counter()
            float(chain4(b4, salts))
            return time.perf_counter() - t0
        t4(2), t4(18)
        d4 = (min(t4(18) for _ in range(2))
              - min(t4(2) for _ in range(2))) / (16 * cfg4.maxits)
        r4s = ksp_solve(Aop4, b4, pc=pc4, ksp_type="cg", rtol=1e-5,
                        maxits=100)
        per4, its4 = max(d4, 1e-9), int(r4s.its)
        cfgs["gamg_cg_ms_per_it"] = round(per4 * 1e3, 3)
        cfgs["gamg_its_to_rtol1e-5"] = its4

        # config 5: ex56 3-D elasticity GAMG(RBM) — the unstructured
        # AMG production workload (BASELINE's elasticity table; r5:
        # chunk-SELL transfers + multT restriction + dense small ops
        # took the default cycle 39.5 -> ~6 ms/it)
        from petsctpu.models.elasticity import ex56_system as _ex56
        A5, b5, coords5 = _ex56(19, 1e-3, dtype=np.float32)
        Aop5, p5 = mat_from_options(A5, mat_type="auto",
                                    dtype=np.float32)
        if p5 is not None:
            Aop5 = aij_from_scipy(A5, dtype=np.float32)
        pc5 = make_pc("gamg", A=Aop5, A_host=A5, options=Options(
            {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 3,
             "pc_gamg_coordinates": coords5}))
        b5j = jnp.asarray(b5, jnp.float32)
        r5s = ksp_solve(Aop5, b5j, pc=pc5, ksp_type="cg", rtol=1e-5,
                        atol=1e-30, maxits=100)
        its5 = int(r5s.its)
        cfg5 = _KC(rtol=1e-30, atol=1e-38, maxits=max(its5, 6))
        x05 = jnp.zeros_like(b5j)

        @jax.jit
        def chain5(b_, salts):
            def step(acc, sl):
                rr = solve_cg(Aop5, b_ * (1 + sl), x05, pc5, cfg5)
                return acc + rr.x[0], None
            return lax.scan(step, jnp.float32(0), salts)[0]

        def t5(K):
            salts = jnp.asarray(np.arange(1, K + 1, dtype=np.float32)
                                * np.float32(1e-6))
            t0 = time.perf_counter()
            float(chain5(b5j, salts))
            return time.perf_counter() - t0
        t5(2), t5(12)
        d5 = (min(t5(12) for _ in range(2))
              - min(t5(2) for _ in range(2))) / (10 * cfg5.maxits)
        cfgs["gamg_rbm_elasticity_ms_per_it"] = round(
            max(d5, 1e-9) * 1e3, 3)
        cfgs["gamg_rbm_elasticity_its"] = its5
    except Exception as ex:                            # pragma: no cover
        cfgs["configs_error"] = repr(ex)[:200]

    # ---- communication-volume audit (weak-scaling proxy): trace the
    # 8-shard distributed CG / PIPECG programs over an AbstractMesh (no
    # devices needed) and report per-iteration collective counts/bytes
    # + the halo plan's static volume — the reference's -log_summary
    # Mess/MessLen/Reductions columns (plog.c:1264) produced at
    # compile time instead of runtime.
    comm = {}
    try:
        import scipy.sparse as sp

        from petsctpu.core.commaudit import halo_audit
        from petsctpu.parallel import sharded_aij_from_scipy
        from petsctpu.parallel.api import audit_par_ksp

        mi8 = 24
        e8 = np.ones(mi8)
        T18 = sp.diags([-e8[:-1], 2 * e8, -e8[:-1]], [-1, 0, 1])
        I18 = sp.eye(mi8)
        A8 = (sp.kron(sp.kron(T18, I18), I18)
              + sp.kron(sp.kron(I18, T18), I18)
              + sp.kron(sp.kron(I18, I18), T18)).tocsr() \
            .astype(np.float32)
        Sh8, part8 = sharded_aij_from_scipy(A8, 8, dtype=np.float32)
        b8 = jnp.zeros(Sh8.shape[0], jnp.float32)
        for kt in ("cg", "pipecg", "gmres", "ibcgs"):
            a = audit_par_ksp(8, Sh8, b8, ksp_type=kt, maxits=10)
            comm[f"{kt}_collectives_per_it"] = a.per_iteration.summary()
        comm["halo_plan"] = halo_audit(part8.halo, np.float32)

        # ---- weak-scaling sweep (VERDICT r4 item 6): FIXED per-shard
        # block (48^3 = 110k rows), shards in {2,4,8,16} along z —
        # bytes/iter and colls/iter per shard from the compile-time
        # audit, plus a roofline-model predicted efficiency. Stated
        # assumptions: v5e HBM 700 GB/s effective, ICI 90 GB/s
        # effective per link, 1.5 us launch+latency per collective.
        # (The reference's methodology analog: the lap2d.m strong/weak
        # tables, src/benchmarks/results/lap2d.m.)
        mloc = 48
        eL = np.ones(mloc)
        TL = sp.diags([-eL[:-1], 2 * eL, -eL[:-1]], [-1, 0, 1])
        IL = sp.eye(mloc)
        A_yz = (sp.kron(TL, IL) + sp.kron(IL, TL)).tocsr()
        sweep = {}
        BW_HBM, BW_ICI, LAT = 700e9, 90e9, 1.5e-6
        n_loc = mloc ** 3
        for Pn in (2, 4, 8, 16):
            mz = mloc * Pn
            ez = np.ones(mz)
            Tz = sp.diags([-ez[:-1], 2 * ez, -ez[:-1]], [-1, 0, 1])
            Iz = sp.eye(mz)
            Aw = (sp.kron(Tz, sp.eye(mloc ** 2))
                  + sp.kron(Iz, A_yz)).tocsr().astype(np.float32)
            ShW, partW = sharded_aij_from_scipy(Aw, Pn,
                                                dtype=np.float32)
            bW = jnp.zeros(ShW.shape[0], jnp.float32)
            nnz_loc = Aw.nnz / Pn
            t_comp = (nnz_loc * 8.0 + 10 * n_loc * 4.0) / BW_HBM
            ent = {"halo": halo_audit(partW.halo, np.float32)}
            for kt in ("cg", "pipecg"):
                aW = audit_par_ksp(Pn, ShW, bW, ksp_type=kt,
                                   maxits=10)
                per = aW.per_iteration
                by = per.summary()["by_op"]
                # halo ppermutes are ISSUED BEFORE the diagonal SpMV
                # (pmat.mult: ghosts() first, diag mult while the
                # collective flies) -> overlap their cost with
                # compute; dot-product psums gate the iteration ->
                # serial
                pperm_n, pperm_b = by.get("ppermute", (0, 0.0))
                psum_n, psum_b = by.get("psum", (0, 0.0))
                t_halo = pperm_b / BW_ICI + pperm_n * LAT
                t_ser = psum_b / BW_ICI + psum_n * LAT
                eff = t_comp / (max(t_comp, t_halo) + t_ser)
                ent[f"{kt}_colls_per_it"] = int(per.total_count)
                ent[f"{kt}_bytes_per_it_per_shard"] = \
                    float(per.total_bytes)
                ent[f"{kt}_predicted_weak_eff"] = round(eff, 4)
                # also the fully-serial (no-overlap) bound
                ent[f"{kt}_weak_eff_no_overlap"] = round(
                    t_comp / (t_comp + t_halo + t_ser), 4)
            sweep[f"shards_{Pn}"] = ent
        comm["weak_scaling_sweep"] = sweep
        # production-scale extrapolation: same audited collective
        # structure, 128^3 rows/shard (halo bytes scale with the
        # shared face, compute with the volume)
        s16 = sweep["shards_16"]
        scale_face = (128.0 / mloc) ** 2
        nloc_big = 128 ** 3
        t_comp_big = (7.0 * nloc_big * 8.0 + 10 * nloc_big * 4.0) / BW_HBM
        t_comm_big = (s16["cg_bytes_per_it_per_shard"] * scale_face
                      / BW_ICI + s16["cg_colls_per_it"] * LAT)
        comm["weak_scaling_model"] = {
            "per_shard_rows_audited": n_loc,
            "assumptions": "HBM 700 GB/s, ICI 90 GB/s, 1.5us/collective;"
                           " halo ppermutes overlapped with the diag"
                           " SpMV (issue-first program order), dot"
                           " psums serial",
            "halo_style": "ppermute (O(neighbors) payload, P-flat)",
            "predicted_eff_16shards_48cube_cg":
                s16["cg_predicted_weak_eff"],
            "predicted_eff_16shards_48cube_pipecg":
                s16["pipecg_predicted_weak_eff"],
            "no_overlap_bound_cg": s16["cg_weak_eff_no_overlap"],
            "predicted_eff_16shards_128cube":
                round(t_comp_big / (t_comp_big + t_comm_big), 4),
            "baseline_target": ">=0.80",
        }
    except Exception as ex:                            # pragma: no cover
        comm["comm_audit_error"] = repr(ex)[:200]

    # stencil traffic: K coefficient arrays + x read + y write
    bytes_moved = 4.0 * n * (K + 2)
    gbs = bytes_moved / dt / 1e9
    frac = gbs / max(stream_gbs, hbm_bandwidth_gbs())
    print(json.dumps({
        "metric": "spmv_hbm_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction_of_peak_hbm_bw",
        "vs_baseline": round(frac / 0.70, 4),
        "detail": {"gbs": round(gbs, 1), "nnz_per_s": f"{Ad.nnz / dt:.3e}",
                   "ms_per_spmv": round(dt * 1e3, 4), "n": n,
                   "stencil_width": K, "peak_gbs": hbm_bandwidth_gbs(),
                   "stream_gbs": round(stream_gbs, 1),
                   "format": "stencil/DIA (2-D 5-point, variable coeff)",
                   **irr, **cfgs, "comm_audit_8shard": comm},
    }))


if __name__ == "__main__":
    main()
