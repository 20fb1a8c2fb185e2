"""Shape and semantics contracts for embedding layers
(reference: tests/test_layers.py plus padding-gradient invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotlight_tpu.ops import BloomEmbedding, ScaledEmbedding, ZeroEmbedding


@pytest.mark.parametrize('embedding_class', [
    ScaledEmbedding,
    BloomEmbedding,
])
def test_embedding_shapes(embedding_class, random_state):
    num_embeddings, embedding_dim = 1000, 16
    batch_size, sequence_length = 32, 8

    layer = embedding_class(num_embeddings, embedding_dim)
    params = layer.init(jax.random.PRNGKey(0))

    # 1-d input (minibatch of ids).
    ids = jnp.asarray(random_state.randint(0, num_embeddings,
                                           size=batch_size, dtype=np.int32))
    out = layer.apply(params, ids)
    assert out.shape == (batch_size, embedding_dim)

    # 2-d input (minibatch x sequence_length).
    ids = jnp.asarray(random_state.randint(
        0, num_embeddings, size=(batch_size, sequence_length),
        dtype=np.int32))
    out = layer.apply(params, ids)
    assert out.shape == (batch_size, sequence_length, embedding_dim)


def test_scaled_embedding_init_stats():
    layer = ScaledEmbedding(10000, 64)
    params = layer.init(jax.random.PRNGKey(0))
    weight = np.asarray(params['weight'])
    assert abs(weight.mean()) < 1e-3
    assert abs(weight.std() - 1.0 / 64) < 1e-3


def test_zero_embedding_is_zero():
    layer = ZeroEmbedding(100, 1)
    params = layer.init(jax.random.PRNGKey(0))
    assert np.all(np.asarray(params['weight']) == 0.0)


def test_padding_row_semantics():
    """Padding lookups return zeros and the padding row receives no
    gradient — matching torch's ``padding_idx`` behaviour."""
    layer = ScaledEmbedding(50, 8, padding_idx=0)
    params = layer.init(jax.random.PRNGKey(0))
    ids = jnp.array([0, 1, 0, 2])

    out = layer.apply(params, ids)
    assert np.all(np.asarray(out[0]) == 0.0)
    assert np.all(np.asarray(out[2]) == 0.0)
    assert np.any(np.asarray(out[1]) != 0.0)

    grads = jax.grad(
        lambda p: layer.apply(p, ids).sum())(params)
    grad_w = np.asarray(grads['weight'])
    assert np.all(grad_w[0] == 0.0)
    assert np.all(grad_w[1] == 1.0)


def test_bloom_embedding_determinism_and_padding():
    layer = BloomEmbedding(1000, 16, compression_ratio=0.2,
                           num_hash_functions=4)
    params = layer.init(jax.random.PRNGKey(0))

    ids = jnp.array([0, 1, 2, 1])
    out = np.asarray(layer.apply(params, ids))
    # Padding id embeds to exactly zero.
    assert np.all(out[0] == 0.0)
    # Same id gives the same embedding.
    assert np.array_equal(out[1], out[3])
    # Different ids (almost surely) differ.
    assert not np.array_equal(out[1], out[2])

    # The frozen padding row of the compressed table gets no gradient.
    grads = jax.grad(lambda p: layer.apply(p, ids).sum())(params)
    assert np.all(np.asarray(grads['weight'])[0] == 0.0)


def test_bloom_collision_rate_reasonable(random_state):
    """With 4 hashes into a 5x-compressed table, full-signature collisions
    should be (much) rarer than 1%."""
    layer = BloomEmbedding(10000, 8, compression_ratio=0.2,
                           num_hash_functions=4)
    ids = jnp.arange(1, 5001)
    rows = np.asarray(layer.hashed_rows(ids))
    signatures = set(map(tuple, rows))
    collision_rate = 1.0 - len(signatures) / len(ids)
    assert collision_rate < 0.01


def test_scaled_embedding_bag_modes(random_state):
    from spotlight_tpu.ops import ScaledEmbeddingBag

    bag = ScaledEmbeddingBag(100, 8)
    params = bag.init(jax.random.PRNGKey(3))

    ids = jnp.asarray(random_state.randint(0, 100, (4, 5)))
    out = bag.apply(params, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(params['weight'])[np.asarray(ids)].sum(1),
        rtol=1e-6)

    # Ragged bags via torch-style offsets.
    flat = jnp.asarray([1, 2, 3, 10, 11])
    offsets = jnp.asarray([0, 3])
    ragged = np.asarray(bag.apply(params, flat, offsets))
    w = np.asarray(params['weight'])
    np.testing.assert_allclose(ragged[0], w[[1, 2, 3]].sum(0), rtol=1e-6)
    np.testing.assert_allclose(ragged[1], w[[10, 11]].sum(0), rtol=1e-6)

    with pytest.raises(ValueError, match='sum'):
        ScaledEmbeddingBag(10, 4, mode='mean')


def test_bloom_embedding_degenerate_sizes_rejected():
    with pytest.raises(ValueError, match='at least 1'):
        BloomEmbedding(10, 4, compression_ratio=0.05)
    with pytest.raises(ValueError, match='num_hash_functions'):
        BloomEmbedding(100, 4, num_hash_functions=0)
    # Boundary: exactly one compressed row is allowed.
    BloomEmbedding(10, 4, compression_ratio=0.1)
