"""MAC Stokes model: discretization invariants + saddle-point solves."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.mat.nullspace import NullSpace, make_nullspace
from petsctpu.models.stokes import stokes_mac
from petsctpu.pc import make_pc
from petsctpu.vec.indexset import IS
import jax
from dataclasses import dataclass, field


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockDiagPC:
    Apc: object
    h2: float = field(metadata=dict(static=True), default=1.0)
    nv: int = field(metadata=dict(static=True), default=0)

    def apply(self, x):
        xv = self.Apc.apply(x[: self.nv])
        xp = x[self.nv:] * self.h2            # pressure mass ≈ h² I
        return jnp.concatenate([xv, xp])


def _pressure_nullspace(n_total, p_idx, dtype=np.float64):
    v = np.zeros(n_total)
    v[p_idx] = 1.0
    return make_nullspace(n_total, has_constant=False, vecs=[v],
                          dtype=dtype)


class TestStokesModel:
    def test_adjointness_and_symmetry(self):
        K, b, (vi, pi), blk = stokes_mac(6)
        # D = −Gᵀ exactly; A symmetric positive definite
        assert (blk["D"] + blk["G"].T).nnz == 0
        A = blk["A"]
        assert abs(A - A.T).max() < 1e-12
        lam = spla.eigsh(A, k=1, which="SA",
                         return_eigenvectors=False)[0]
        assert lam > 0

    def test_direct_solution_properties(self):
        m = 8
        K, b, (vi, pi), blk = stokes_mac(m)
        n = K.shape[0]
        # pin one pressure (constant null space) for the direct solve
        Kp = K.tolil()
        Kp[pi[0], :] = 0.0
        Kp[pi[0], pi[0]] = 1.0
        x = spla.spsolve(sp.csc_matrix(Kp), b)
        # discrete divergence of the velocity field is zero
        div = blk["D"] @ x[vi]
        assert np.abs(div).max() < 1e-8
        # lid drives a nonzero flow
        assert np.abs(x[vi]).max() > 0.1

    def test_fieldsplit_schur_solve(self):
        m = 8
        K, b, (vi, pi), blk = stokes_mac(m)
        Kd = aij_from_scipy(K)
        fields = [IS.general(vi), IS.general(pi)]
        pc = make_pc("fieldsplit", A=Kd, A_host=K,
                     options=Options({
                         "pc_fieldsplit_fields": fields,
                         "pc_fieldsplit_type": "schur"}))
        nsp = _pressure_nullspace(K.shape[0], pi)
        r = ksp_solve(Kd, jnp.asarray(b), pc=pc, ksp_type="fgmres",
                      rtol=1e-8, maxits=200, nullspace=nsp)
        assert r.converged
        x = np.asarray(r.x)
        div = blk["D"] @ x[vi]
        assert np.abs(div).max() < 1e-5

    def test_minres_block_diag(self):
        """Silvester-Wathen block-diagonal MINRES. The pressure null
        space is removed by PINNING one pressure dof (the standard
        practice: an un-pinned singular saddle system stalls the
        Lanczos process — verified identical behavior in scipy's
        minres, same residual plateau)."""
        m = 6
        K, b, (vi, pi), blk = stokes_mac(m)
        Kp = K.tolil()
        Kp[pi[0], :] = 0.0
        Kp[:, pi[0]] = 0.0
        Kp[pi[0], pi[0]] = 1.0
        Kp = sp.csr_matrix(Kp)
        Kd = aij_from_scipy(Kp)
        from petsctpu.pc.factor import make_lu

        Apc = make_lu(blk["A"])
        pc = BlockDiagPC(Apc, 1.0, len(vi))
        r = ksp_solve(Kd, jnp.asarray(b), pc=pc,
                      ksp_type="minres", rtol=1e-9, maxits=400)
        assert r.converged
        x = np.asarray(r.x)
        assert np.abs(blk["D"] @ x[vi]).max() < 1e-4
