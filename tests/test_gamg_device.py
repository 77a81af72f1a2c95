"""Device-side GAMG re-setup (pc/gamg_device).

Reference: PCSetUp_GAMG (gamg.c:533) re-runs host sparse algebra on
every operator refresh; here the symbolic side is frozen once and
`refresh(a_data)` rebuilds the numeric hierarchy INSIDE jit — so a
Newton loop can rebuild its AMG preconditioner per step without
leaving the device (the matmatmult.c:29 symbolic/numeric split taken
to its conclusion)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.ksp import ksp_solve
from petsctpu.ksp.common import KSPConfig
from petsctpu.mat import aij_from_scipy
from petsctpu.models import laplacian_2d
from petsctpu.pc.gamg_device import (csr_data_of_matching,
                                     gamg_device_plan)


class TestDeviceGAMG:
    def test_refresh_preconditions_cg(self):
        m = 40
        A = laplacian_2d(m, m, dtype=np.float64).tocsr()
        plan = gamg_device_plan(A, dtype=np.float64, coarse_n=32)
        assert len(plan.levels) >= 2
        pc = jax.jit(plan.refresh)(
            jnp.asarray(csr_data_of_matching(A, np.float64)))
        Ad = aij_from_scipy(A, dtype=np.float64)
        b = jnp.asarray(np.random.default_rng(0).standard_normal(m * m))
        r = ksp_solve(Ad, b, pc=pc, ksp_type="cg", rtol=1e-8, maxits=60)
        assert int(r.reason) > 0 and int(r.its) <= 15

    def test_refresh_new_coefficients(self):
        """Same pattern, new values (a TS/Newton operator refresh):
        the refreshed hierarchy must precondition the NEW operator."""
        m = 40
        rng = np.random.default_rng(1)
        A = laplacian_2d(m, m, dtype=np.float64).tocsr()
        plan = gamg_device_plan(A, dtype=np.float64, coarse_n=32)
        A2 = A.copy()
        # variable-coefficient rescale (SPD preserved): D A D
        d = np.exp(0.3 * rng.standard_normal(m * m))
        A2 = (sp.diags(d) @ A @ sp.diags(d)).tocsr()
        A2.sort_indices()
        assert (A2.indices == A.indices).all()
        pc2 = jax.jit(plan.refresh)(
            jnp.asarray(csr_data_of_matching(A2, np.float64)))
        A2d = aij_from_scipy(A2, dtype=np.float64)
        b = jnp.asarray(rng.standard_normal(m * m))
        r = ksp_solve(A2d, b, pc=pc2, ksp_type="cg", rtol=1e-8, maxits=80)
        assert int(r.reason) > 0 and int(r.its) <= 25

        # and the coarse operator numerics match the host Galerkin
        # product for the new values (through the frozen pattern),
        # replicating the device's deterministic omega (fixed v0
        # power iteration, 12 its)
        from petsctpu.pc.gamg import (aggregate, strength_graph,
                                      tentative_prolongator)
        S = strength_graph(A, 0.0)
        P0 = tentative_prolongator(aggregate(S))
        dinv = 1.0 / A2.diagonal()
        v = np.asarray(plan.levels[0].v0, dtype=np.float64)
        for _ in range(plan.power_its):
            w = dinv * (A2 @ v)
            lam = np.linalg.norm(w)
            v = w / max(lam, 1e-30)
        omega = 4.0 / (3.0 * lam)
        Ph = (P0 - omega * sp.diags(dinv) @ A2 @ P0).tocsr()
        Ach = (Ph.T @ A2 @ Ph).tocsr()
        lev1_A = pc2.levels[1].A
        x = rng.standard_normal(Ach.shape[0])
        got = np.asarray(lev1_A.mult(jnp.asarray(x)))
        np.testing.assert_allclose(got, Ach @ x, rtol=1e-9, atol=1e-10)

    def test_newton_with_device_gamg_rebuild(self):
        """Newton-Krylov where the GAMG hierarchy is REBUILT on device
        every Newton step (pc_builder=refresh_from_ell) — the
        operator-refresh path the reference pays host PCSetUp_GAMG
        for (gamg.c:533)."""
        from petsctpu.dm.da import DA
        from petsctpu.models.bratu import (bratu_initial_guess,
                                           bratu_residual)
        from petsctpu.snes.api import snes_solve
        from petsctpu.snes.fdjac import ColoredJacobian

        m = 24
        da = DA((m, m))
        F = bratu_residual(da, 6.0)
        x0 = bratu_initial_guess(da, 6.0)
        # host pattern of the Jacobian = 5-point Laplacian pattern
        Ah = laplacian_2d(m, m, dtype=np.float64).tocsr()
        tmpl = aij_from_scipy(Ah, dtype=np.float64)
        cj = ColoredJacobian.from_sparsity(Ah, tmpl)
        plan = gamg_device_plan(Ah, dtype=np.float64, coarse_n=32)

        r = snes_solve(F, x0, jac=cj,
                       pc_builder=lambda J: plan.refresh_from_ell(J),
                       rtol=1e-8,
                       ksp_cfg=KSPConfig(ksp_type="fgmres", rtol=1e-8,
                                         maxits=40))
        assert int(r.reason) > 0
        assert int(r.its) <= 6
        # solution check: residual is tiny
        assert float(jnp.linalg.norm(F(r.x))) < 1e-6


class TestProbeGAMG:
    """Comb-probe Galerkin refresh (gamg_probe_plan): the colored-SpMV
    route must reproduce the SpGEMM-plan route's hierarchy exactly
    (VERDICT r3 item 1; reference: agg.c:1110 + gamg.c:156 MatPtAP)."""

    def test_matches_spgemm_plan(self):
        from petsctpu.pc.gamg_device import gamg_probe_plan
        m = 40
        A = laplacian_2d(m, m, dtype=np.float32).tocsr()
        a0 = jnp.asarray(csr_data_of_matching(A, np.float32))
        p_old = gamg_device_plan(A, dtype=np.float32, coarse_n=32)
        p_new = gamg_probe_plan(A, dtype=np.float32, coarse_n=32)
        pc_o = jax.jit(p_old.refresh)(a0)
        pc_n = jax.jit(p_new.refresh)(a0)
        assert len(pc_o.levels) == len(pc_n.levels)
        for lo, ln in zip(pc_o.levels, pc_n.levels):
            np.testing.assert_allclose(np.asarray(ln.P.P.vals),
                                       np.asarray(lo.P.vals),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(ln.smoother.dinv),
                                       np.asarray(lo.smoother.dinv),
                                       rtol=1e-4)
        np.testing.assert_allclose(np.asarray(pc_n.coarse.lu),
                                   np.asarray(pc_o.coarse.lu),
                                   rtol=1e-3, atol=1e-4)

    def test_probe_refresh_preconditions_cg(self):
        from petsctpu.pc.gamg_device import gamg_probe_plan
        m = 40
        rng = np.random.default_rng(4)
        A = laplacian_2d(m, m, dtype=np.float32).tocsr()
        plan = gamg_probe_plan(A, dtype=np.float32, coarse_n=32)
        d = np.exp(0.2 * rng.standard_normal(m * m))
        A2 = (sp.diags(d) @ A @ sp.diags(d)).tocsr()
        A2.sort_indices()
        pc2 = jax.jit(plan.refresh)(
            jnp.asarray(csr_data_of_matching(A2, np.float32)))
        A2d = aij_from_scipy(A2, dtype=np.float32)
        b = jnp.asarray(rng.standard_normal(m * m).astype(np.float32))
        r = ksp_solve(A2d, b, pc=pc2, ksp_type="cg", rtol=1e-6, maxits=80)
        assert int(r.reason) > 0 and int(r.its) <= 25

    def test_probe_blocked_rbm_route(self):
        """ex56-style elasticity through asa tentatives (p0s)."""
        from petsctpu.models.elasticity import ex56_system
        from petsctpu.pc.asa import asa_tentatives
        from petsctpu.pc.gamg import rigid_body_modes
        from petsctpu.pc.gamg_device import gamg_probe_plan
        A, b, coords = ex56_system(5, 1e-3, dtype=np.float32)
        B = rigid_body_modes(coords, dof=3)
        p0s = asa_tentatives(A, B, coarse_n=30, bs=3)
        plan = gamg_probe_plan(A, p0s=p0s, coarse_n=60, dtype=np.float32)
        pc = jax.jit(plan.refresh)(
            jnp.asarray(csr_data_of_matching(A, np.float32)))
        Ad = aij_from_scipy(A, dtype=np.float32)
        bd = jnp.asarray(np.asarray(b, np.float32))
        r = ksp_solve(Ad, bd, pc=pc, ksp_type="cg", rtol=1e-6, maxits=120)
        assert int(r.reason) > 0
