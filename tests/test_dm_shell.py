"""DMShell / DMRedundant / DMSliced specialty DMs."""

import jax.numpy as jnp
import numpy as np

from petsctpu.dm.shell import DMShell, DMRedundant, DMSliced


class TestDMShell:
    def test_callbacks(self):
        dm = DMShell(4,
                     create_vec=lambda dt: jnp.ones(4, dt),
                     global_to_local=lambda x: jnp.pad(x, 1),
                     local_to_global=lambda xl: xl[1:-1])
        v = dm.create_global_vector()
        assert v.shape == (4,) and float(v[0]) == 1.0
        xl = dm.to_local(v)
        assert xl.shape == (6,)
        np.testing.assert_allclose(np.asarray(dm.to_global(xl)),
                                   np.asarray(v))

    def test_defaults(self):
        dm = DMShell(3)
        assert dm.create_global_vector().shape == (3,)
        x = jnp.arange(3.0)
        assert (dm.to_local(x) == x).all()


class TestDMRedundant:
    def test_vec_and_mat(self):
        dm = DMRedundant(5)
        assert dm.create_global_vector().shape == (5,)
        M = dm.create_matrix()
        assert M.shape == (5, 5)


class TestDMSliced:
    def test_gather_scatter(self):
        dm = DMSliced(10, owned=np.array([2, 3, 4]),
                      ghosts=np.array([1, 5]))
        x = jnp.arange(10.0)
        xl = np.asarray(dm.to_local(x))
        np.testing.assert_allclose(xl, [2, 3, 4, 1, 5])
        y = np.asarray(dm.to_global(jnp.asarray(xl * 10.0)))
        expect = np.zeros(10)
        expect[[2, 3, 4]] = [20, 30, 40]   # ghosts not written back
        np.testing.assert_allclose(y, expect)
