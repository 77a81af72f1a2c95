"""DMComposite, AO, PetscDT quadrature."""

import jax.numpy as jnp
import numpy as np

from petsctpu.dm import (
    AO, DA, DMComposite, gauss_jacobi_quadrature, gauss_lobatto_quadrature,
    gauss_quadrature, gauss_tensor_quadrature,
)


class TestComposite:
    def test_pack_split_roundtrip(self):
        da = DA((4, 4))
        comp = DMComposite.create(da, 5, DA((3,)))
        assert comp.n == 16 + 5 + 3
        a = jnp.arange(16.0)
        b = jnp.arange(5.0) + 100
        c = jnp.arange(3.0) + 200
        x = comp.pack(a, b, c)
        pa, pb, pc_ = comp.split(x)
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(pb), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(pc_), np.asarray(c))

    def test_global_iss_drive_fieldsplit(self):
        comp = DMComposite.create(6, 4)
        iss = comp.global_iss()
        np.testing.assert_array_equal(iss[0].indices, np.arange(6))
        np.testing.assert_array_equal(iss[1].indices, np.arange(6, 10))

    def test_grids(self):
        da = DA((3, 5))
        comp = DMComposite.create(da, 2)
        g, s = comp.split_grids(jnp.arange(17.0))
        assert g.shape == (3, 5) and s.shape == (2,)


class TestAO:
    def test_basic_roundtrip(self):
        app = np.array([3, 0, 2, 1])
        ao = AO.create_basic(app)
        np.testing.assert_array_equal(ao.app_to_petsc(app), np.arange(4))
        np.testing.assert_array_equal(ao.petsc_to_app(np.arange(4)), app)

    def test_negative_passthrough(self):
        ao = AO.create_basic(np.array([1, 0]))
        np.testing.assert_array_equal(ao.app_to_petsc(np.array([-1, 1])),
                                      [-1, 0])

    def test_vector_permute(self):
        app = np.array([2, 0, 1])
        ao = AO.create_basic(app)
        v_app = np.array([20.0, 0.0, 10.0])   # value for app index i at slot i
        v_petsc = ao.permute_app_to_petsc(v_app)
        np.testing.assert_array_equal(ao.permute_petsc_to_app(v_petsc), v_app)

    def test_mapping_nonpermutation(self):
        ao = AO.create_mapping(np.array([10, 3, 7]))
        np.testing.assert_array_equal(ao.app_to_petsc_tab, [2, 0, 1])


class TestQuadrature:
    def test_gauss_exactness(self):
        """n-point Gauss integrates degree 2n-1 exactly."""
        x, w = gauss_quadrature(4)
        for d in range(8):
            exact = (1 - (-1) ** (d + 1)) / (d + 1)
            np.testing.assert_allclose(np.sum(w * x ** d), exact, atol=1e-13)

    def test_gauss_interval(self):
        x, w = gauss_quadrature(5, 0.0, 2.0)
        np.testing.assert_allclose(np.sum(w), 2.0, atol=1e-13)
        np.testing.assert_allclose(np.sum(w * x), 2.0, atol=1e-13)

    def test_lobatto_endpoints_and_exactness(self):
        x, w = gauss_lobatto_quadrature(4)
        assert x[0] == -1.0 and x[-1] == 1.0
        for d in range(6):     # exact to degree 2n-3 = 5
            exact = (1 - (-1) ** (d + 1)) / (d + 1)
            np.testing.assert_allclose(np.sum(w * x ** d), exact, atol=1e-13)

    def test_jacobi_weight(self):
        # ∫ (1-x) dx on [-1,1] with alpha=1,beta=0 weight: f=1 → 2
        x, w = gauss_jacobi_quadrature(3, 1.0, 0.0)
        np.testing.assert_allclose(np.sum(w), 2.0, atol=1e-12)

    def test_tensor_2d(self):
        pts, w = gauss_tensor_quadrature(2, 3)
        assert pts.shape == (9, 2)
        np.testing.assert_allclose(np.sum(w), 4.0, atol=1e-13)
        np.testing.assert_allclose(np.sum(w * pts[:, 0] ** 2 * pts[:, 1] ** 2),
                                   4.0 / 9.0, atol=1e-13)
