"""Capacity-factored all-to-all lookup (model-sharded batches).

The refinement over the replicated-batch exchange
(`parallel/sharding.py:alltoall_capacity_lookup`): each model shard holds
its own distinct batch slice and exchanges only per-owner request
buckets.  Exactness is asserted against the dense gather, the psum-based
collective, and the replicated all-to-all — forward, backward, and
end-to-end through the training engine.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spotlight_tpu.parallel import make_mesh
from spotlight_tpu.parallel.sharding import alltoall_capacity_lookup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


def _model_mesh(size=4):
    return Mesh(np.asarray(jax.devices()[:size]), axis_names=('model',))


def test_cf_forward_matches_dense(random_state):
    """Each shard looks up its own slice; reassembly equals the dense
    gather bit-for-bit (no arithmetic is reordered)."""
    mesh = _model_mesh()
    num_rows, dim = 64, 8
    weight = jnp.asarray(random_state.randn(num_rows, dim), jnp.float32)
    ids = jnp.asarray(random_state.randint(0, num_rows, (16, 5)),
                      jnp.int32)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('model', None), P('model', None)),
                       out_specs=(P('model', None, None), P('model')),
                       check_vma=False)
    def lookup(w_local, ids_local):
        vectors, overflow = alltoall_capacity_lookup(
            w_local, ids_local, axis='model')
        return vectors, overflow[None]

    out, overflow = lookup(weight, ids)
    assert np.all(np.asarray(overflow) == 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(weight[ids]))


def test_cf_reduced_capacity_reports_overflow(random_state):
    """With every id owned by shard 0 and capacity 2, each shard fits two
    requests; the rest overflow (zero rows, counted)."""
    mesh = _model_mesh()
    weight = jnp.asarray(random_state.randn(64, 4), jnp.float32)
    # 5 ids per shard, all owned by shard 0 (rows 0..15).
    ids = jnp.asarray(random_state.randint(0, 16, (4, 5)), jnp.int32)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('model', None), P('model', None)),
                       out_specs=(P('model', None, None), P('model')),
                       check_vma=False)
    def lookup(w_local, ids_local):
        vectors, overflow = alltoall_capacity_lookup(
            w_local, ids_local, axis='model', capacity=2)
        return vectors, overflow[None]

    out, overflow = lookup(weight, ids)
    np.testing.assert_array_equal(np.asarray(overflow), [3, 3, 3, 3])
    got = np.asarray(out).reshape(4, 5, 4)
    expected = np.asarray(weight)[np.asarray(ids)]
    for shard in range(4):
        # Exactly two rows per shard are served; the served ones exact.
        served = (got[shard] != 0).any(axis=1)
        assert served.sum() == 2
        np.testing.assert_array_equal(got[shard][served],
                                      expected[shard][served])


def test_cf_gradients_reach_owners(random_state):
    """Each device back-propagates only its own slice; the transposed
    exchanges deliver every cotangent to its owner exactly once."""
    mesh = _model_mesh()
    num_rows, dim = 32, 4
    weight = jnp.asarray(random_state.randn(num_rows, dim), jnp.float32)
    ids = jnp.asarray(random_state.randint(0, num_rows, (8,)), jnp.int32)

    def dense_loss(w):
        return (w[ids] ** 2).sum()

    dense_grad = jax.grad(dense_loss)(weight)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('model', None), P('model')),
                       out_specs=P('model', None),
                       check_vma=False)
    def sharded_grad(w_local, ids_local):
        def local_loss(w_local):
            out, _ = alltoall_capacity_lookup(w_local, ids_local,
                                              axis='model')
            return (out ** 2).sum()

        return jax.grad(local_loss)(w_local)

    got = sharded_grad(weight, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense_grad),
                               rtol=1e-6, atol=1e-7)


def _train_explicit(mesh, exchange):
    """Deterministic training run (explicit loss: no negative sampling, so
    every exchange mode computes the same mathematical gradients)."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import ExplicitFactorizationModel

    rs = np.random.RandomState(7)
    n = 512
    interactions = Interactions(
        rs.randint(0, 37, n).astype(np.int32),
        rs.randint(0, 53, n).astype(np.int32),
        ratings=rs.randint(1, 6, n).astype(np.float32),
        num_users=37, num_items=53)
    model = ExplicitFactorizationModel(
        loss='regression', embedding_dim=16, n_iter=2, batch_size=64,
        mesh=mesh, exchange=exchange,
        random_state=np.random.RandomState(42))
    model.fit(interactions)
    return (model._last_epoch_loss,
            np.asarray(model._params['item_embeddings']['weight'])[:53],
            model)


def test_cf_training_matches_other_exchanges():
    mesh = make_mesh(data=2, model=4)
    loss_cf, weight_cf, model = _train_explicit(mesh, 'alltoall_cf')
    loss_psum, weight_psum, _ = _train_explicit(mesh, 'psum')
    loss_a2a, weight_a2a, _ = _train_explicit(mesh, 'alltoall')

    # Identical math, different reduction grouping: allclose, not bitwise.
    assert abs(loss_cf - loss_psum) < 1e-5
    assert abs(loss_cf - loss_a2a) < 1e-5
    np.testing.assert_allclose(weight_cf, weight_psum, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(weight_cf, weight_a2a, rtol=2e-5, atol=2e-6)

    # Prediction paths run on the cf-trained model.
    assert model.predict(0).shape == (53,)


def test_cf_implicit_smoke():
    """Implicit path (per-shard negative streams) trains and evaluates."""
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.evaluation import mrr_score
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    mesh = make_mesh(data=2, model=4)
    rs = np.random.RandomState(3)
    n = 1024
    interactions = Interactions(
        rs.randint(0, 60, n).astype(np.int32),
        rs.randint(0, 90, n).astype(np.int32),
        num_users=60, num_items=90)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=16, n_iter=2, batch_size=128,
        mesh=mesh, exchange='alltoall_cf',
        random_state=np.random.RandomState(42))
    model.fit(interactions)
    assert np.isfinite(model._last_epoch_loss)
    assert np.isfinite(mrr_score(model, interactions).mean())


def test_cf_batch_divisibility_check():
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match='batch-shard count'):
        ImplicitFactorizationModel(batch_size=12, mesh=mesh,
                                   exchange='alltoall_cf')


def test_cf_sequence_smoke():
    """Sequence path (fused item table, per-shard negative streams,
    batch sharded over both mesh axes) trains and evaluates under the
    capacity-factored exchange."""
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    mesh = make_mesh(data=2, model=4)
    rs = np.random.RandomState(5)
    sequences = rs.randint(1, 90, size=(256, 8)).astype(np.int32)
    data = SequenceInteractions(sequences, num_items=90)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', embedding_dim=16, n_iter=2,
        batch_size=64, mesh=mesh, exchange='alltoall_cf',
        random_state=np.random.RandomState(42))
    model.fit(data)
    assert np.isfinite(model._last_epoch_loss)
    assert np.isfinite(sequence_mrr_score(model, data).mean())
