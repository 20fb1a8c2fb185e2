"""The all-to-all id-exchange lookup must agree with the dense gather and
the psum-based collective lookup, forward and backward."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spotlight_tpu.parallel.sharding import alltoall_lookup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason='needs 4 (virtual) devices')


def _mesh():
    return Mesh(np.asarray(jax.devices()[:4]), axis_names=('model',))


def test_alltoall_forward_matches_dense(random_state):
    mesh = _mesh()
    num_rows, dim = 64, 8
    weight = jnp.asarray(random_state.randn(num_rows, dim),
                         dtype=jnp.float32)
    ids = jnp.asarray(random_state.randint(0, num_rows, (3, 10)),
                      dtype=jnp.int32)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('model', None), P(None, None)),
                       out_specs=P(None, None, None),
                       check_vma=False)
    def lookup(w_local, ids):
        return alltoall_lookup(w_local, ids, axis='model')

    out = lookup(weight, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(weight[ids]),
                               rtol=0, atol=0)


def test_alltoall_gradients_reach_owners(random_state):
    """Cotangents travel back through the reversed exchanges and land as
    scatter-adds on the owning shard's rows."""
    mesh = _mesh()
    num_rows, dim = 32, 4
    weight = jnp.asarray(random_state.randn(num_rows, dim),
                         dtype=jnp.float32)
    ids = jnp.asarray([0, 5, 5, 31, 17], dtype=jnp.int32)

    def dense_loss(w):
        return (w[ids] ** 2).sum()

    dense_grad = jax.grad(dense_loss)(weight)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('model', None), P(None)),
                       out_specs=P('model', None),
                       check_vma=False)
    def sharded_grad(w_local, ids):
        num_shards = jax.lax.axis_size('model')

        def local_loss(w_local):
            out = alltoall_lookup(w_local, ids, axis='model')
            # Every shard computes the identical full loss; divide by the
            # replica count so the cotangents arriving at each owner from
            # all requesters sum to the true gradient.
            return (out ** 2).sum() / num_shards

        return jax.grad(local_loss)(w_local)

    got = sharded_grad(weight, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense_grad),
                               rtol=1e-5, atol=1e-6)
