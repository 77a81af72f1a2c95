"""DMDA 2-D process-grid decomposition + 4-rank ex49 goldens.

The reference runs ex49_2/ex49_3 with `mpiexec -n 4` (makefile:973-981)
— GCR/GMRES + PCASM(overlap 1, restricted) + subdomain LU over the
DMDA's 2×2 process-grid decomposition. dm/decomp.py reproduces the
rank-dependent pieces exactly: the squarish proc split (da2.c), the
rank-major PETSc global ordering, per-rank element assembly with the
MatStash duplicate-summation fp order, and MatMult_MPIAIJ's
diag-then-offdiag fp order — so the 4-rank monitor streams match the
checked-in goldens digit-for-digit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from petsctpu.dm.decomp import DADecomp2D, da_ownership, da_proc_grid
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.q1elasticity import (ex49_parallel_reduced_system,
                                          ex49_reduced_system)
from petsctpu.pc.asm import make_asm


class TestDecomp:
    def test_proc_grid_squarish(self):
        # ex49 -mx 20 -my 30 on 4 ranks: 21x31 nodes -> 2x2
        assert da_proc_grid(21, 31, 4) == (2, 2)
        # strongly anisotropic: M >> N puts more ranks on x
        assert da_proc_grid(100, 4, 8) == (8, 1)
        m, n = da_proc_grid(33, 33, 6)
        assert m * n == 6

    def test_ownership(self):
        np.testing.assert_array_equal(da_ownership(21, 2), [11, 10])
        np.testing.assert_array_equal(da_ownership(31, 2), [16, 15])
        np.testing.assert_array_equal(da_ownership(10, 4), [3, 3, 2, 2])

    def test_ao_is_permutation(self):
        dec = DADecomp2D.create(21, 31, dof=2, size=4)
        p = dec.natural_to_petsc()
        assert p.size == 2 * 21 * 31
        assert np.array_equal(np.sort(p), np.arange(p.size))
        # rank patches are contiguous in petsc ordering
        for r, (s, e) in enumerate(dec.petsc_row_ranges()):
            xs, xm, ys, ym = dec.patch(r)
            assert e - s == 2 * xm * ym

    def test_element_ownership_partition(self):
        dec = DADecomp2D.create(21, 31, dof=2, size=4)
        own = dec.element_owner()
        assert own.size == 20 * 30
        counts = np.bincount(own, minlength=4)
        # lx=[11,10], ly=[16,15] => element boxes 11x16, 9x16, 11x14, 9x14
        np.testing.assert_array_equal(counts, [11 * 16, 9 * 16,
                                               11 * 14, 9 * 14])

    def test_parallel_assembly_same_matrix(self):
        """4-rank assembly = serial assembly up to a symmetric
        permutation and fp summation-order noise."""
        import scipy.sparse as sp

        AA_s, ff_s, keep, xbc = ex49_reduced_system(
            8, 10, c_str=3, E0=1, E1=1000, nu0=0.4, nu1=0.2, t=1, w=8)
        AA_p, ff_p, blocks, dec = ex49_parallel_reduced_system(
            8, 10, 4, c_str=3, E0=1, E1=1000, nu0=0.4, nu1=0.2,
            t=1, w=8)
        perm = dec.natural_to_petsc()
        # reduced-space permutation: serial keep index k -> position of
        # perm[keep[k]] among sorted kept petsc indices
        kept_p = np.sort(perm[keep])
        q = np.searchsorted(kept_p, perm[keep])
        P = sp.csr_matrix((np.ones(q.size), (q, np.arange(q.size))))
        d = (P @ AA_s @ P.T) - AA_p
        assert abs(d).max() < 1e-12
        np.testing.assert_allclose(P @ ff_s, ff_p, rtol=0, atol=1e-12)


GOLDEN_2 = [11.0657, 9.82448, 5.72, 4.9875, 4.80734, 4.77481, 2.99999,
            0.647522, 0.435418, 0.40683, 0.375704, 0.367218, 0.324555,
            0.169496, 0.0626851, 0.0177735, 0.00516671, 0.00497833,
            0.00496462, 0.00495307, 0.00490987, 0.00406464, 0.00143166,
            0.000331028, 0.000261577, 0.000244857, 0.00024382,
            0.000234861, 0.000150362, 4.4272e-05]

GOLDEN_3 = [14.5933, 3.17351, 1.80112, 0.956478, 0.769255, 0.472171,
            0.310625, 0.156897, 0.107258, 0.0828635, 0.0641164,
            0.0582209, 0.0498088, 0.0374655, 0.0294233, 0.0199933,
            0.0153346, 0.0128219, 0.00971579, 0.00770772, 0.00616479,
            0.0039644, 0.00274328, 0.00212024, 0.0018374, 0.00171071,
            0.00160742, 0.00159028, 0.00147057, 0.000790694,
            0.000203051, 0.000122616]


def _monitor_values(capsys):
    out = capsys.readouterr().out
    return [float(l.split()[-1]) for l in out.splitlines()
            if "Residual norm" in l]


class TestEx49Parallel:
    def test_ex49_2_gcr_asm(self, capsys):
        """output/ex49_2.out (mpiexec -n 4, -elas_ksp_type gcr
        -elas_pc_type asm -elas_sub_pc_type lu): 29 its; every monitor
        line digit-exact except iteration 26 (one ULP in the 6th
        printed digit)."""
        AA, ff, blocks, dec = ex49_parallel_reduced_system(
            20, 30, 4, c_str=3, E0=1, E1=1000, nu0=0.4, nu1=0.2,
            t=1, w=8)
        assert [e - s for s, e in blocks] == [336, 304, 315, 285]
        pc = make_asm(AA, blocks=blocks, overlap=1, sub_pc="lu")
        capsys.readouterr()
        r = ksp_solve(aij_from_scipy(AA), jnp.asarray(ff), pc=pc,
                      ksp_type="gcr", rtol=1e-5, atol=1e-50,
                      monitor=True)
        jnp.asarray(r.x).block_until_ready()
        vals = _monitor_values(capsys)
        assert int(r.its) == 29
        assert len(vals) == 30
        exact = sum(f"{v:g}" == f"{g:g}" for v, g in zip(vals, GOLDEN_2))
        assert exact >= 29, exact
        np.testing.assert_allclose(vals, GOLDEN_2, rtol=5e-6)

    def test_ex49_3_gmres_asm_brick(self, capsys):
        """output/ex49_3.out (mpiexec -n 4, -c_str 2 -brick_E
        1,10,1000,100 -brick_nu 0.4,0.2,0.3,0.1 -brick_span 3
        -elas_pc_type asm -elas_sub_pc_type lu): 31 its, ALL 32
        monitor lines digit-exact."""
        AA, ff, blocks, dec = ex49_parallel_reduced_system(
            20, 30, 4, c_str=2, brick_E=[1, 10, 1000, 100],
            brick_nu=[0.4, 0.2, 0.3, 0.1], span=3)
        pc = make_asm(AA, blocks=blocks, overlap=1, sub_pc="lu")
        capsys.readouterr()
        r = ksp_solve(aij_from_scipy(AA), jnp.asarray(ff), pc=pc,
                      ksp_type="gmres", rtol=1e-5, atol=1e-50,
                      cgs_refine="always", monitor=True)
        jnp.asarray(r.x).block_until_ready()
        vals = _monitor_values(capsys)
        assert int(r.its) == 31
        assert len(vals) == 32
        for v, g in zip(vals, GOLDEN_3):
            assert f"{v:g}" == f"{g:g}", (v, g)
