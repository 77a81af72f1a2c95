"""2-D elasticity model + rigid-body-mode GAMG (PCSetCoordinates)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from petsctpu.core.options import Options
from petsctpu.ksp import ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models.elasticity import elasticity_2d
from petsctpu.pc import make_pc
from petsctpu.pc.gamg import rigid_body_modes


class TestElasticityModel:
    def test_spd_and_cantilever_sags(self):
        A, coords, b = elasticity_2d(8, 4)
        assert abs(A - A.T).max() < 1e-12
        lam = spla.eigsh(A, k=1, which="SA",
                         return_eigenvectors=False)[0]
        assert lam > 0                         # clamped: SPD
        x = spla.spsolve(A.tocsc(), b)
        # tip sags downward under the downward traction
        assert x[1::2].min() < -1e-3

    def test_rigid_body_modes_in_nullspace(self):
        # unclamped operator: K @ rigid modes = 0
        from petsctpu.models.elasticity import _q1_element_stiffness
        import scipy.sparse as sp
        mx = my = 3
        # build the UNclamped matrix by re-running assembly pieces
        A, coords, b = elasticity_2d(mx, my)
        B = rigid_body_modes(coords)
        assert B.shape[1] == 3
        # orthonormal columns
        np.testing.assert_allclose(B.T @ B, np.eye(3), atol=1e-12)
        # translations are exactly null for the FREE operator only in
        # the interior sense; verify via element stiffness instead:
        Ke = _q1_element_stiffness()
        nodes_xy = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        rb = np.zeros((8, 3))
        rb[0::2, 0] = 1
        rb[1::2, 1] = 1
        rb[0::2, 2] = -nodes_xy[:, 1]
        rb[1::2, 2] = nodes_xy[:, 0]
        assert np.abs(Ke @ rb).max() < 1e-12   # exact element null space

    def test_gamg_coordinates_beats_plain(self):
        A, coords, b = elasticity_2d(24, 12)
        Ad = aij_from_scipy(A)
        bd = jnp.asarray(b)
        pc0 = make_pc("gamg", A=Ad, A_host=A)
        pc1 = make_pc("gamg", A=Ad, A_host=A,
                      options=Options({"pc_gamg_coordinates": coords}))
        r0 = ksp_solve(Ad, bd, pc=pc0, ksp_type="cg", rtol=1e-8,
                       maxits=400)
        r1 = ksp_solve(Ad, bd, pc=pc1, ksp_type="cg", rtol=1e-8,
                       maxits=400)
        assert r1.converged
        assert int(r1.its) < int(r0.its)       # rigid modes help
        x = np.asarray(r1.x)
        np.testing.assert_allclose(A @ x, b, atol=1e-7)


class TestEx55ElasticityGAMG:
    """ksp ex55: 2-D Q1 elasticity (2 dof/node interleaved) with a
    soft inclusion — the reference's flagship GAMG elasticity test.
    Model pinned digit-exact via an oracle-minted Jacobi-CG stream;
    GAMG runs at count-level (aggregation tie-breaking differs)."""

    def test_model_digit_exact(self):
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models.elasticity import ex55_system
        from petsctpu.pc import make_pc

        A, b, _ = ex55_system(29, 1e-3)
        Ad = aij_from_scipy(A)
        r = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                      ksp_type="cg", rtol=1e-30, maxits=3)
        np.testing.assert_allclose(
            np.asarray(r.history[:4]),
            [6.59495, 10.9339, 8.90538, 6.6421], rtol=2e-5)

    def test_gamg_translation_and_rbm_candidates(self):
        """runex55_NC (translational default null space for bs=2) and
        runex55_SA (-use_coordinates → rigid-body modes): node-level
        (bs-collapsed) aggregation + rank-safe block tentative
        prolongators. Oracle: 15 its (NC), 11 its (RBM); ours must
        match or beat (currently 12 / 8)."""
        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models.elasticity import ex55_system
        from petsctpu.pc import make_pc

        A, b, coords = ex55_system(29, 1e-3)
        Ad = aij_from_scipy(A)
        pc = make_pc("gamg", A=Ad, A_host=A, options=Options(
            {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 2}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg",
                      rtol=1e-5, atol=1e-50, maxits=100)
        assert int(r.reason) > 0 and int(r.its) <= 15, int(r.its)
        pc = make_pc("gamg", A=Ad, A_host=A, options=Options(
            {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 2,
             "pc_gamg_coordinates": coords}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg",
                      rtol=1e-5, atol=1e-50, maxits=100)
        assert int(r.reason) > 0 and int(r.its) <= 11, int(r.its)


class TestEx56Elasticity3D:
    """ksp ex56: 3-D Q1 elasticity (3 dof/node) with a soft spherical
    inclusion; the 24×24 element stiffness is the reference's shipped
    data artifact (data/elem_3d_elast_v_25.txt)."""

    def test_model_digit_exact(self):
        import os

        import pytest

        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models.elasticity import ex56_system
        from petsctpu.pc import make_pc

        if not os.path.exists("/root/reference/src/ksp/ksp/examples/"
                              "tutorials/data/elem_3d_elast_v_25.txt"):
            pytest.skip("reference data artifact unavailable")
        A, b, _ = ex56_system(9, 1e-3)
        Ad = aij_from_scipy(A)
        r = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                      ksp_type="cg", rtol=1e-30, maxits=3)
        np.testing.assert_allclose(
            np.asarray(r.history[:4]),
            [411.418, 82.3284, 140.89, 279.459], rtol=2e-5)

    def test_gamg_rbm_3d(self):
        """runex56 configuration (ne=19, 24000 dof, 6 rigid-body
        modes): the reference-source oracle converges in 13 CG
        iterations; ours must match or beat (currently 6)."""
        import os

        import pytest

        from petsctpu.core.options import Options
        from petsctpu.ksp import ksp_solve
        from petsctpu.mat import aij_from_scipy
        from petsctpu.models.elasticity import ex56_system
        from petsctpu.pc import make_pc

        if not os.path.exists("/root/reference/src/ksp/ksp/examples/"
                              "tutorials/data/elem_3d_elast_v_25.txt"):
            pytest.skip("reference data artifact unavailable")
        A, b, coords = ex56_system(19, 1e-3)
        Ad = aij_from_scipy(A)
        pc = make_pc("gamg", A=Ad, A_host=A, options=Options(
            {"pc_gamg_coarse_eq_limit": 80, "pc_gamg_dof": 3,
             "pc_gamg_coordinates": coords}))
        r = ksp_solve(Ad, jnp.asarray(b), pc=pc, ksp_type="cg",
                      rtol=1e-5, atol=1e-50, maxits=100)
        assert int(r.reason) > 0 and int(r.its) <= 13, int(r.its)
