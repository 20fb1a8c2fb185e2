"""Sharding/collective correctness on a forced 8-device CPU mesh.

The discipline SURVEY.md §4 prescribes for multi-chip code without a
cluster: exact-equality tests that the sharded lookup / training step
matches the single-device path, run on
``--xla_force_host_platform_device_count=8`` virtual devices.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import mrr_score, rmse_score
from spotlight_tpu.factorization import (ExplicitFactorizationModel,
                                         ImplicitFactorizationModel)
from spotlight_tpu.ops.embeddings import ScaledEmbedding
from spotlight_tpu.parallel import ShardedEmbedding, make_mesh, shard_params

from tests._fixtures import factorization_dataset, sequential_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {'data': 2, 'model': 4}
    mesh = make_mesh(model=4)
    assert mesh.shape == {'data': 2, 'model': 4}
    mesh = make_mesh()
    assert mesh.shape == {'data': 8, 'model': 1}


def test_sharded_lookup_matches_dense():
    """Collective lookup inside shard_map == plain gather, exactly."""
    mesh = make_mesh(data=2, model=4)
    inner = ScaledEmbedding(103, 16, padding_idx=0)  # deliberately ragged
    layer = ShardedEmbedding(inner, axis='model', num_shards=4)

    params = layer.init(jax.random.PRNGKey(0))
    assert params['weight'].shape == (104, 16)  # padded to 4 shards
    params = shard_params(params, layer.spec(), mesh)

    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 103, size=(2, 64)),
        dtype=jnp.int32)

    dense = inner.apply({'weight': params['weight'][:103]}, ids)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(layer.spec(), P('data', None)),
                       out_specs=P('data', None, None),
                       check_vma=True)
    def lookup(p, batch_ids):
        return layer.apply(p, batch_ids)

    sharded = lookup(params, ids)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=0, atol=0)


def test_sharded_lookup_gradients_match():
    """Gradients through the collective lookup land on the right rows."""
    mesh = make_mesh(data=2, model=4)
    inner = ScaledEmbedding(40, 8, padding_idx=0)
    layer = ShardedEmbedding(inner, axis='model', num_shards=4)
    params = layer.init(jax.random.PRNGKey(1))
    ids = jnp.asarray([[1, 5, 39, 0], [7, 7, 2, 12]], dtype=jnp.int32)

    def dense_loss(p):
        return (inner.apply({'weight': p['weight'][:40]}, ids) ** 2).sum()

    dense_grads = jax.grad(dense_loss)(params)

    sharded_p = shard_params(params, layer.spec(), mesh)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(layer.spec(), P('data', None)),
                       out_specs=layer.spec(),
                       check_vma=True)
    def sharded_grads_fn(p, batch_ids):
        def local_loss(p):
            out = layer.apply(p, batch_ids)
            return (out ** 2).sum()
        # vma-aware AD inserts the psum over 'data' in the transpose
        # (p is data-invariant), so the local grad is already global.
        return jax.grad(local_loss)(p)

    sharded_grads = sharded_grads_fn(sharded_p, ids)
    np.testing.assert_allclose(np.asarray(sharded_grads['weight']),
                               np.asarray(dense_grads['weight']),
                               rtol=1e-5, atol=1e-6)


def test_explicit_distributed_matches_single_device():
    """Full distributed training (data x model sharding) reproduces the
    single-device parameters exactly: same shuffle keys, deterministic loss,
    global masked-mean reduction."""
    interactions = factorization_dataset(
        num_users=150, num_items=120, num_interactions=6000, explicit=True)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    def fit(mesh):
        model = ExplicitFactorizationModel(
            loss='regression', embedding_dim=16, n_iter=3, batch_size=256,
            learning_rate=1e-2, l2=1e-6,
            random_state=np.random.RandomState(42), mesh=mesh)
        model.fit(train)
        return model

    single = fit(None)
    distributed = fit(make_mesh(data=2, model=4))

    rmse_single = rmse_score(single, test)
    rmse_dist = rmse_score(distributed, test)
    assert abs(rmse_single - rmse_dist) < 1e-4

    w_single = np.asarray(single._params['item_embeddings']['weight'])
    w_dist = np.asarray(
        distributed._params['item_embeddings']['weight'])[:120]
    np.testing.assert_allclose(w_single, w_dist, rtol=1e-4, atol=1e-5)


def test_implicit_distributed_learns():
    """Distributed implicit training (on-device per-shard negative
    sampling) reaches the same statistical gates as single-device."""
    interactions = factorization_dataset(
        num_users=600, num_items=400, num_interactions=30000,
        rank=8, noise=0.15)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-2, l2=1e-6,
        random_state=np.random.RandomState(42),
        mesh=make_mesh(data=2, model=4))
    model.fit(train)
    assert mrr_score(model, test, train=train).mean() > 0.03


def test_bloom_tables_shard_on_mesh():
    """Bloom-compressed tables row-shard over 'model' like any other
    table (round-4: the compressed table is a plain table of hashed
    rows); the sharded model's training run is exactly equal to the
    replicated-bloom single-device run."""
    from spotlight_tpu.factorization import BilinearNet
    from spotlight_tpu.ops import BloomEmbedding

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    def build(mesh):
        representation = BilinearNet(
            train.num_users, train.num_items, 16,
            user_embedding_layer=BloomEmbedding(train.num_users, 16,
                                                compression_ratio=0.5),
            item_embedding_layer=BloomEmbedding(train.num_items, 16,
                                                compression_ratio=0.5))
        model = ImplicitFactorizationModel(
            loss='bpr', n_iter=2, batch_size=256,
            representation=representation, mesh=mesh,
            random_state=np.random.RandomState(42))
        model.fit(train)
        return model

    model = build(make_mesh(data=2, model=4))

    # Compressed tables AND bias tables row-sharded over 'model'.
    specs = model._param_specs
    assert specs['user_embeddings']['weight'] == P('model', None)
    assert specs['user_biases']['weight'] == P('model', None)
    assert model.predict(0).shape == (90,)
    assert np.isfinite(mrr_score(model, test).mean())


def test_sharded_bloom_lookup_and_gradients_match_replicated():
    """The sharded bloom lookup (hashed-row exchange + k-sum) and its
    gradients are exactly equal to the replicated BloomEmbedding's."""
    from spotlight_tpu.ops import BloomEmbedding
    from spotlight_tpu.parallel import ShardedBloomEmbedding

    mesh = make_mesh(data=2, model=4)
    inner = BloomEmbedding(500, 16, compression_ratio=0.41,  # ragged: 205
                           num_hash_functions=4)
    layer = ShardedBloomEmbedding(inner, axis='model', num_shards=4)

    params = layer.init(jax.random.PRNGKey(0))
    assert params['weight'].shape == (208, 16)  # 205 padded to 4 shards
    replicated = {'weight': params['weight'][:205]}
    sharded_p = shard_params(params, layer.spec(), mesh)

    ids = jnp.asarray(
        np.random.RandomState(0).randint(0, 500, size=(2, 64)),
        dtype=jnp.int32)
    ids = ids.at[0, 0].set(0)  # exercise the frozen padding row

    dense = inner.apply(replicated, ids)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(layer.spec(), P('data', None)),
                       out_specs=P('data', None, None),
                       check_vma=True)
    def lookup(p, batch_ids):
        return layer.apply(p, batch_ids)

    sharded = lookup(sharded_p, ids)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=0, atol=0)

    # Global view (evaluation path): plain gather over the padded table.
    np.testing.assert_allclose(np.asarray(layer.apply(params, ids)),
                               np.asarray(dense), rtol=0, atol=0)

    # Gradients land on the owning shard's compressed rows, matching the
    # replicated layer's scatter-adds (padding row gets none).
    def dense_loss(p):
        return (inner.apply({'weight': p['weight'][:205]}, ids) ** 2).sum()

    dense_grads = jax.grad(dense_loss)(params)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(layer.spec(), P('data', None)),
                       out_specs=layer.spec(),
                       check_vma=True)
    def sharded_grads_fn(p, batch_ids):
        def local_loss(p):
            return (layer.apply(p, batch_ids) ** 2).sum()
        return jax.grad(local_loss)(p)

    sharded_grads = sharded_grads_fn(sharded_p, ids)
    np.testing.assert_allclose(np.asarray(sharded_grads['weight']),
                               np.asarray(dense_grads['weight']),
                               rtol=1e-5, atol=1e-6)
    assert np.asarray(sharded_grads['weight'])[0].sum() == 0.0


@pytest.mark.parametrize('representation', ['pooling', 'cnn', 'mixture'])
def test_all_representations_train_on_mesh(representation):
    """Every sequence family compiles and executes the full distributed
    step (item tables sharded, dense towers replicated)."""
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.sequence import ImplicitSequenceModel

    rs = np.random.RandomState(0)
    data = SequenceInteractions(
        rs.randint(1, 50, size=(256, 6)).astype(np.int32), num_items=50)
    model = ImplicitSequenceModel(
        loss='adaptive_hinge', representation=representation,
        embedding_dim=16, batch_size=64, n_iter=1,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(1))
    model.fit(data)
    assert model.predict(data.sequences[0]).shape == (50,)


def test_sequence_distributed_learns():
    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    interactions = sequential_dataset(
        num_users=100, num_items=100, num_interactions=10000,
        concentration_parameter=1e-3, order=2, seed=42)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(42))
    train = train.to_sequence(max_sequence_length=10)
    test = test.to_sequence(max_sequence_length=10)

    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', batch_size=128,
        embedding_dim=32, learning_rate=1e-2, l2=1e-7, n_iter=10,
        random_state=np.random.RandomState(42),
        mesh=make_mesh(data=2, model=4))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > 0.35


def test_alltoall_exchange_matches_single_device():
    """The all-to-all id-exchange training mode reproduces the
    single-device parameters exactly, like the psum mode (deterministic
    explicit loss; manual gradient calculus under check_vma=False)."""
    interactions = factorization_dataset(
        num_users=150, num_items=120, num_interactions=6000, explicit=True)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    def fit(mesh, exchange='psum'):
        model = ExplicitFactorizationModel(
            loss='regression', embedding_dim=16, n_iter=3, batch_size=256,
            learning_rate=1e-2, l2=1e-6,
            random_state=np.random.RandomState(42), mesh=mesh,
            exchange=exchange)
        model.fit(train)
        return model

    single = fit(None)
    a2a = fit(make_mesh(data=2, model=4), exchange='alltoall')

    assert abs(rmse_score(single, test) - rmse_score(a2a, test)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(single._params['item_embeddings']['weight']),
        np.asarray(a2a._params['item_embeddings']['weight'])[:120],
        rtol=1e-4, atol=1e-5)


def test_alltoall_exchange_implicit_learns():
    interactions = factorization_dataset(
        num_users=600, num_items=400, num_interactions=30000,
        rank=8, noise=0.15)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-2, l2=1e-6,
        random_state=np.random.RandomState(42),
        mesh=make_mesh(data=2, model=4), exchange='alltoall')
    model.fit(train)
    assert mrr_score(model, test, train=train).mean() > 0.03


def test_exchange_string_validated():
    """A typo'd exchange mode raises instead of silently running the
    default psum gather (advisor round-4 finding)."""
    from spotlight_tpu.sequence import ImplicitSequenceModel

    with pytest.raises(ValueError, match='exchange must be one of'):
        ImplicitFactorizationModel(exchange='alltoall-cf')
    with pytest.raises(ValueError, match='exchange must be one of'):
        ImplicitSequenceModel(exchange='all_to_all')


def test_placed_data_cache_keys_on_live_mesh_identity():
    """Replacing a model's mesh invalidates the placed-data cache even
    when the same arrays are passed (no id()-recycling false hits:
    the entry holds the mesh object itself)."""
    from spotlight_tpu.utils.training import placed_data_cached

    class Owner:
        pass

    owner = Owner()
    arrays = {'a': np.arange(8, dtype=np.int32)}
    mesh_a = make_mesh(data=2, model=4)
    placed_a = placed_data_cached(owner, arrays, mesh_a)
    # Same mesh, same bytes: a hit.
    assert placed_data_cached(owner, arrays, mesh_a) is placed_a
    # A different (live) mesh object: a miss, repositioned data.
    mesh_b = make_mesh(data=4, model=2)
    placed_b = placed_data_cached(owner, arrays, mesh_b)
    assert placed_b is not placed_a
    assert placed_data_cached(owner, arrays, mesh_b) is placed_b
