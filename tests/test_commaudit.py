"""Communication-volume observability (core/commaudit): the
-log_summary Mess/MessLen/Reductions columns produced as a
compile-time jaxpr audit (reference: plog.c:1264, petsclog.h:294)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from petsctpu.parallel import sharded_aij_from_scipy
from petsctpu.parallel.api import audit_par_ksp


def _poisson3d(m):
    e = np.ones(m)
    T1 = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I1 = sp.eye(m)
    return (sp.kron(sp.kron(T1, I1), I1) + sp.kron(sp.kron(I1, T1), I1)
            + sp.kron(sp.kron(I1, I1), T1)).tocsr().astype(np.float32)


class TestCommAudit:
    def test_solver_collective_counts(self):
        """The audited per-iteration reduction counts are the
        solver-defining ones: CG has 2 psums (dot + norm), PIPECG 1
        (the fused late reduction — its comm-avoidance claim,
        pipecg.c:45), IBCGS 2 by default (fused recurrence reduction
        + fresh norm, the reference's !lagnorm path ibcgs.c:238) and
        1 with -ksp_lag_norm (the famous single-reduction variant)."""
        A = _poisson3d(16)
        Sh, _ = sharded_aij_from_scipy(A, 8, dtype=np.float32)
        b = jnp.zeros(Sh.shape[0], jnp.float32)
        counts = {}
        for kt in ("cg", "pipecg", "ibcgs"):
            a = audit_par_ksp(8, Sh, b, ksp_type=kt, maxits=5)
            counts[kt] = a.per_iteration.counts.get("psum", 0)
        assert counts["cg"] == 2
        assert counts["pipecg"] == 1
        assert counts["ibcgs"] == 2
        a = audit_par_ksp(8, Sh, b, ksp_type="ibcgs", maxits=5,
                          lag_norm=True)
        assert a.per_iteration.counts.get("psum", 0) == 1

    def test_cg_single_reduction_collectives(self):
        """-ksp_cg_single_reduction (KSPCGUseSingleReduction,
        cg.c:349): the delta/beta recurrence merges every inner
        product of the iteration — including the natural norm — into
        ONE fused psum (the reference still pays 2 MPI_Allreduce
        because its VecMDot and VecNorm stay separate; the audit shows
        the fully-fused TPU program does 1)."""
        A = _poisson3d(16)
        Sh, _ = sharded_aij_from_scipy(A, 8, dtype=np.float32)
        b = jnp.zeros(Sh.shape[0], jnp.float32)
        a = audit_par_ksp(8, Sh, b, ksp_type="cg", maxits=5,
                          cg_single_reduction=True, norm_type="natural")
        assert a.per_iteration.counts.get("psum", 0) == 1
        # steady state still runs ONE SpMV (s = Az; w = Ap comes from
        # the recurrence), so the halo cost matches plain CG
        assert a.per_iteration.counts.get("ppermute", 0) == 2

    def test_halo_bytes_counted(self):
        A = _poisson3d(16)
        Sh, part = sharded_aij_from_scipy(A, 8, dtype=np.float32)
        b = jnp.zeros(Sh.shape[0], jnp.float32)
        a = audit_par_ksp(8, Sh, b, ksp_type="cg", maxits=5)
        from petsctpu.core.commaudit import halo_audit
        h = halo_audit(part.halo, np.float32)
        # style auto picks the neighbor-ppermute route for this banded
        # partition (2 ring offsets): one ppermute per offset per SpMV
        # per iteration, payload = smax per shift — the weak-scalable
        # O(neighbors) halo, vs the dense all_to_all P*smax layout
        assert Sh.style == "ppermute"
        assert a.per_iteration.counts.get("ppermute", 0) == 2
        item = np.dtype(np.float32).itemsize
        assert (a.per_iteration.bytes["ppermute"]
                == 2 * part.halo.smax * item)
        # the dense all_to_all route still audits to the plan's ledger
        Sh2, part2 = sharded_aij_from_scipy(A, 8, dtype=np.float32,
                                            style="alltoall")
        a2 = audit_par_ksp(8, Sh2, b, ksp_type="cg", maxits=5)
        assert a2.per_iteration.counts.get("all_to_all", 0) == 1
        assert (a2.per_iteration.bytes["all_to_all"]
                == h["halo_bytes_per_exchange_per_shard"])

    def test_scan_multiplier_and_once(self):
        """Collectives inside lax.scan multiply by length; outside any
        loop they land in `once`."""
        from petsctpu.core.commaudit import audit_collectives
        mesh = jax.sharding.AbstractMesh((4,), ("r",))
        from jax.sharding import PartitionSpec as P

        def prog(x):
            def body(xl):
                s = jax.lax.psum(xl, "r")

                def sbody(c, _):
                    return c + jax.lax.psum(c, "r"), ()
                out, _ = jax.lax.scan(sbody, s, None, length=7)
                return out
            return jax.shard_map(body, mesh=mesh, in_specs=P("r"),
                                 out_specs=P("r"),
                                 check_vma=False)(x)

        a = audit_collectives(prog, jnp.ones(8, jnp.float32))
        assert a.once.counts["psum"] == 8        # 1 + 7 (scan unrolls)

    def test_log_view_mess_columns(self):
        """A logged parallel solve accrues the Mess/MessMB columns."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from jax.sharding import Mesh
        from petsctpu.core import logging as plog
        from petsctpu.parallel import par_ksp_solve
        A = _poisson3d(12)
        Sh, part = sharded_aij_from_scipy(A, 4, dtype=np.float32)
        mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
        b = np.random.default_rng(0).standard_normal(A.shape[0]) \
            .astype(np.float32)
        plog.log_begin()
        r = par_ksp_solve(mesh, Sh, b, ksp_type="cg", rtol=1e-5,
                          maxits=50)
        assert int(r.reason) > 0
        view = plog.log_view()
        plog._state.enabled = False
        assert "Mess" in view
        row = [ln for ln in view.splitlines() if "KSPSolve_cg" in ln]
        assert row and float(row[0].split()[-2]) > 0

    def test_distmg_agglomeration_reduces_collectives(self):
        """GAMG's coarse-grid agglomeration (createLevel proc
        reduction, gamg.c:174-198): replicating the small tail of the
        hierarchy must REDUCE the per-cycle collective count vs
        keeping every level sharded — the audit is the regression
        guard for pod-scale MG cycle latency (VERDICT r4 weak #5)."""
        from petsctpu.core.options import Options
        from petsctpu.pc.distmg import make_dist_gamg

        A = _poisson3d(20).astype(np.float32)
        b = None
        counts = {}
        for tag, repl in (("agglomerated", 2048), ("all_sharded", 8)):
            pc = make_dist_gamg(A, 8, dtype=np.float32,
                                options=Options({"pc_mg_repl_size": repl}))
            Sh, _ = sharded_aij_from_scipy(A, 8, dtype=np.float32)
            bv = jnp.zeros(Sh.shape[0], jnp.float32)
            a = audit_par_ksp(8, Sh, bv, pc=pc, ksp_type="cg", maxits=5)
            counts[tag] = a.per_iteration.total_count
        assert counts["agglomerated"] < counts["all_sharded"], counts
