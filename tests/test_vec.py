import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from petsctpu.vec import ops
from tests.testutil import mesh_1d, multidev


class TestSerialOps:
    def test_dot_norm(self):
        a = jnp.asarray([1.0, 2.0, 3.0])
        b = jnp.asarray([4.0, 5.0, 6.0])
        assert float(ops.dot(a, b)) == 32.0
        np.testing.assert_allclose(float(ops.norm(a)), np.sqrt(14.0))
        assert float(ops.norm_1(a)) == 6.0
        assert float(ops.norm_inf(-a)) == 3.0

    def test_mdot(self):
        V = jnp.asarray(np.arange(12.0).reshape(3, 4))
        x = jnp.ones(4)
        np.testing.assert_allclose(np.asarray(ops.mdot(x, V)),
                                   np.asarray(V).sum(1))

    def test_axpy_family(self):
        x = jnp.asarray([1.0, 2.0])
        y = jnp.asarray([10.0, 20.0])
        np.testing.assert_allclose(np.asarray(ops.axpy(y, 2.0, x)), [12.0, 24.0])
        np.testing.assert_allclose(np.asarray(ops.aypx(y, 2.0, x)), [21.0, 42.0])
        np.testing.assert_allclose(np.asarray(ops.waxpy(3.0, x, y)), [13.0, 26.0])


@multidev
class TestShardedOps:
    """The same vec code inside shard_map over an 8-device CPU mesh."""

    def _mesh(self):
        return mesh_1d()

    def test_sharded_dot_norm(self):
        mesh = self._mesh()
        n = 64
        rng = np.random.default_rng(0)
        a = rng.standard_normal(n)
        b = rng.standard_normal(n)

        @functools.partial(shard_map, mesh=mesh, in_specs=(P("rows"), P("rows")),
                           out_specs=P())
        def f(al, bl):
            return jnp.stack([ops.dot(al, bl, axis="rows"),
                              ops.norm(al, axis="rows"),
                              ops.norm_inf(al, axis="rows")])

        got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got[0], a @ b, rtol=1e-12)
        np.testing.assert_allclose(got[1], np.linalg.norm(a), rtol=1e-12)
        np.testing.assert_allclose(got[2], np.abs(a).max(), rtol=1e-12)

    def test_fused_reduce_all(self):
        mesh = self._mesh()
        a = np.arange(16.0)

        @functools.partial(shard_map, mesh=mesh, in_specs=(P("rows"),),
                           out_specs=(P(), P()))
        def f(al):
            s1 = jnp.sum(al)
            s2 = jnp.sum(al * al)
            return ops.reduce_all((s1, s2), axis="rows")

        s1, s2 = f(jnp.asarray(a))
        assert float(s1) == a.sum()
        assert float(s2) == (a * a).sum()
