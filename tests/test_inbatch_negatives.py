"""In-batch negative sampling (negative_sampling='in_batch').

Negatives are other batch rows' positive items (circular shift), reusing
the already-gathered rows: correctness is checked exactly against scoring
the rolled ids explicitly, and learnability against the reference's own
statistical gates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spotlight_tpu.factorization import (BilinearNet,
                                         ImplicitFactorizationModel)
from spotlight_tpu.sequence import ImplicitSequenceModel, LSTMNet

from tests._fixtures import factorization_dataset, sequential_dataset


def test_bilinear_inbatch_matches_rolled_ids(random_state):
    net = BilinearNet(num_users=30, num_items=40, embedding_dim=8)
    params = net.init(jax.random.PRNGKey(0))
    users = jnp.asarray(random_state.randint(0, 30, 16), jnp.int32)
    items = jnp.asarray(random_state.randint(0, 40, 16), jnp.int32)

    positive, negative = net.apply_with_inbatch_negatives(
        params, users, items, num_negatives=2)
    np.testing.assert_allclose(np.asarray(positive),
                               np.asarray(net.apply(params, users, items)),
                               rtol=1e-6)
    for shift in (1, 2):
        expected = net.apply(params, users, jnp.roll(items, shift))
        np.testing.assert_allclose(np.asarray(negative[shift - 1]),
                                   np.asarray(expected), rtol=1e-6,
                                   atol=1e-6)


def test_sequence_inbatch_matches_rolled_ids(random_state):
    net = LSTMNet(num_items=40, embedding_dim=8)
    params = net.init(jax.random.PRNGKey(1))
    seq = jnp.asarray(random_state.randint(1, 40, (6, 5)), jnp.int32)
    reprs, _ = net.user_representation(params, seq)

    negative = net.score_inbatch_negatives(params, reprs, seq,
                                           num_negatives=2)
    for shift in (1, 2):
        expected = net.score(params, reprs, jnp.roll(seq, shift, axis=0))
        np.testing.assert_allclose(np.asarray(negative[shift - 1]),
                                   np.asarray(expected), rtol=1e-6,
                                   atol=1e-6)


def test_weighted_inbatch_elems_pointwise_weights_negative_term_only():
    """For pointwise the importance weight applies to the sampled
    (negative) sigmoid term only; pairwise losses weight the whole pair
    term (round-2 advisor finding)."""
    from spotlight_tpu.ops.losses import bpr_loss, pointwise_loss
    from spotlight_tpu.ops.sampling import weighted_inbatch_elems

    rs = np.random.RandomState(7)
    pos = jnp.asarray(rs.randn(16), jnp.float32)
    neg = jnp.asarray(rs.randn(16), jnp.float32)
    w = jnp.asarray(rs.rand(16).astype(np.float32) + 0.5)

    elems = pointwise_loss(pos, neg, reduce=False)
    weighted = weighted_inbatch_elems('pointwise', elems, neg, w)
    expected = (1.0 - jax.nn.sigmoid(pos)) + w * jax.nn.sigmoid(neg)
    np.testing.assert_allclose(np.asarray(weighted), np.asarray(expected),
                               rtol=1e-6, atol=1e-7)

    elems = bpr_loss(pos, neg, reduce=False)
    weighted = weighted_inbatch_elems('bpr', elems, neg, w)
    np.testing.assert_allclose(np.asarray(weighted),
                               np.asarray(elems * w), rtol=1e-6)


def test_pointwise_inbatch_trains():
    """End-to-end: the split-term pointwise weighting trains finitely."""
    interactions = factorization_dataset(
        num_users=60, num_items=50, num_interactions=1500)
    model = ImplicitFactorizationModel(
        loss='pointwise', n_iter=2, batch_size=128,
        negative_sampling='in_batch',
        random_state=np.random.RandomState(0))
    model.fit(interactions)
    assert np.isfinite(model._last_epoch_loss)


@pytest.mark.parametrize('loss', ['bpr', 'adaptive_hinge'])
def test_implicit_mf_inbatch_learns(loss):
    """Calibrated gate: on this uniform-popularity synthetic fixture,
    in-batch negatives reach ~0.04 MRR (uniform sampling's gate is 0.05)
    — in-batch trades a little synthetic-fixture accuracy for ~1/3 fewer
    HBM row touches and popularity-weighted negatives (which only pay off
    on popularity-skewed real data; see docs/performance.md)."""
    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=6000)
    from spotlight_tpu.data import random_train_test_split
    from spotlight_tpu.evaluation import mrr_score

    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss=loss, n_iter=10, batch_size=512,
        negative_sampling='in_batch',
        random_state=np.random.RandomState(42))
    model.fit(train)
    assert mrr_score(model, test, train=train).mean() > 0.03


@pytest.mark.parametrize('randomness, expected_mrr', [
    (1e-3, 0.45),
    (1e2, 0.03),
])
def test_sequence_inbatch_learns(randomness, expected_mrr):
    """Learnable-vs-random contrast (the reference's gate pattern): the
    low-entropy chain must be learned far above the near-random chain's
    chance floor.  Calibrated at 0.45 (uniform sampling's gate is 0.61 on
    the same fixture): in-batch negatives give up some accuracy on this
    uniform-popularity fixture in exchange for fewer row touches."""
    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.evaluation import sequence_mrr_score

    interactions = sequential_dataset(
        num_users=100, num_items=100, num_interactions=10000,
        concentration_parameter=randomness, order=2, seed=42)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(42))
    train = train.to_sequence(max_sequence_length=10)
    test = test.to_sequence(max_sequence_length=10)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', batch_size=128,
        embedding_dim=32, learning_rate=1e-2, l2=1e-7, n_iter=25,
        negative_sampling='in_batch',
        random_state=np.random.RandomState(42))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


def test_invalid_negative_sampling_rejected():
    with pytest.raises(AssertionError):
        ImplicitFactorizationModel(negative_sampling='bogus')
    with pytest.raises(AssertionError):
        ImplicitSequenceModel(negative_sampling='bogus')


def test_inbatch_mixture_smoke():
    """Mixture scoring of rolled target rows (inherited _score_vectors)."""
    from spotlight_tpu.data.interactions import SequenceInteractions

    rs = np.random.RandomState(3)
    seqs = rs.randint(1, 60, size=(128, 8)).astype(np.int32)
    data = SequenceInteractions(seqs, num_items=60)
    model = ImplicitSequenceModel(
        loss='bpr', representation='mixture', embedding_dim=16, n_iter=2,
        batch_size=64, negative_sampling='in_batch',
        random_state=np.random.RandomState(0))
    model.fit(data)
    assert np.isfinite(model._last_epoch_loss)


def test_inbatch_on_mesh_smoke():
    """In-batch negatives roll within each data shard's batch slice and
    train under the distributed engine."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.parallel import make_mesh

    rs = np.random.RandomState(4)
    n = 1024
    inter = Interactions(rs.randint(0, 60, n).astype(np.int32),
                         rs.randint(0, 90, n).astype(np.int32),
                         num_users=60, num_items=90)
    model = ImplicitFactorizationModel(
        loss='bpr', embedding_dim=16, n_iter=2, batch_size=128,
        mesh=make_mesh(data=2, model=4), negative_sampling='in_batch',
        random_state=np.random.RandomState(0))
    model.fit(inter)
    assert np.isfinite(model._last_epoch_loss)
    assert model.predict(0).shape == (90,)


def test_inbatch_bloom_smoke():
    """Bloom-compressed tables select the classic layout; in-batch rolls
    the gathered bloom rows + separate bias rows."""
    from spotlight_tpu.data.interactions import SequenceInteractions
    from spotlight_tpu.ops import BloomEmbedding

    rs = np.random.RandomState(5)
    seqs = rs.randint(1, 60, size=(128, 8)).astype(np.int32)
    data = SequenceInteractions(seqs, num_items=60)
    model = ImplicitSequenceModel(
        loss='adaptive_hinge', embedding_dim=16, n_iter=2, batch_size=64,
        negative_sampling='in_batch',
        representation=LSTMNet(
            60, 16,
            item_embedding_layer=BloomEmbedding(60, 16,
                                                compression_ratio=0.5)),
        random_state=np.random.RandomState(0))
    model.fit(data)
    assert np.isfinite(model._last_epoch_loss)
