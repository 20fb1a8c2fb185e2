"""The Pallas streaming-rank evaluation path must agree with the standard
materialize-sort path (kernel run in interpreter mode on CPU)."""

import numpy as np
import pytest

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import mrr_score, sequence_mrr_score
from spotlight_tpu.factorization import ImplicitFactorizationModel
from spotlight_tpu.sequence import ImplicitSequenceModel

from tests._fixtures import factorization_dataset, sequential_dataset


@pytest.fixture(scope='module')
def fitted_factorization():
    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


@pytest.fixture(scope='module')
def fitted_sequence():
    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    from spotlight_tpu.data import user_based_train_test_split
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=8)
    test = test.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', n_iter=2,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


def test_streaming_mrr_matches(fitted_factorization):
    train, test, model = fitted_factorization
    standard = mrr_score(model, test, streaming=False)
    streamed = mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_mrr_with_train_mask_matches(fitted_factorization):
    train, test, model = fitted_factorization
    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_sequence_mrr_matches(fitted_sequence):
    _, test, model = fitted_sequence
    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_sequence_mrr_exclude_preceding_matches(fitted_sequence):
    _, test, model = fitted_sequence
    standard = sequence_mrr_score(model, test, exclude_preceding=True,
                                  streaming=False)
    streamed = sequence_mrr_score(model, test, exclude_preceding=True,
                                  streaming=True)
    np.testing.assert_allclose(streamed, standard, rtol=1e-4, atol=1e-6)


def test_streaming_precision_recall_matches(fitted_factorization):
    from spotlight_tpu.evaluation import precision_recall_score

    train, test, model = fitted_factorization
    ks = np.array([1, 5, 10])
    p_std, r_std = precision_recall_score(model, test, k=ks,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, k=ks,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_precision_recall_with_train_mask_matches(
        fitted_factorization):
    """Train-masked streaming top-k (over-fetch + compaction) reproduces
    the FLOAT_MAX-demotion semantics of the standard path."""
    from spotlight_tpu.evaluation import precision_recall_score

    train, test, model = fitted_factorization
    p_std, r_std = precision_recall_score(model, test, train=train, k=10,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train, k=10,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_sequence_precision_recall_matches(fitted_sequence):
    from spotlight_tpu.evaluation import sequence_precision_recall_score

    _, test, model = fitted_sequence
    p_std, r_std = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=False)
    p_str, r_str = sequence_precision_recall_score(model, test, k=4,
                                                   streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_mrr_on_mesh_matches():
    """With mesh-sharded tables, the streaming path routes through the
    sharded rank-count collective and still matches the standard path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.parallel import make_mesh

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = mrr_score(model, test, train=train, streaming=False)
    streamed = mrr_score(model, test, train=train, streaming=True)
    # Per-shard matmul partial sums differ from the full matmul at the
    # last float bit, which can shift ranks by +-1 near ties; allow that
    # jitter while requiring tight aggregate agreement.
    np.testing.assert_allclose(streamed, standard, rtol=0.05, atol=5e-3)
    assert abs(streamed.mean() - standard.mean()) < 1e-3


def test_streaming_falls_back_for_mixture():
    """Mixture scoring is not a dot product; the streaming path must fall
    back to the standard path rather than mis-evaluate."""
    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    sequences = interactions.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        representation='mixture', n_iter=1,
        random_state=np.random.RandomState(42))
    model.fit(sequences)
    assert model._rank_factors_sequences(
        sequences.sequences[:4, :-1]) is None
    out = sequence_mrr_score(model, sequences, streaming=True)
    assert out.shape == (len(sequences.sequences),)


def test_streaming_sequence_pr_exclude_preceding_matches(fitted_sequence):
    from spotlight_tpu.evaluation import sequence_precision_recall_score

    _, test, model = fitted_sequence
    p_std, r_std = sequence_precision_recall_score(
        model, test, k=4, exclude_preceding=True, streaming=False)
    p_str, r_str = sequence_precision_recall_score(
        model, test, k=4, exclude_preceding=True, streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_precision_recall_on_mesh_matches():
    """With mesh-sharded tables, P@k routes through the per-shard top-k
    tournament merge and matches the standard path exactly (top-k is not
    tie-sensitive the way average ranks are: candidate selection happens
    per shard on identical local matmuls)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.evaluation import precision_recall_score
    from spotlight_tpu.parallel import make_mesh

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=512,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    p_std, r_std = precision_recall_score(model, test, train=train, k=10,
                                          streaming=False)
    p_str, r_str = precision_recall_score(model, test, train=train, k=10,
                                          streaming=True)
    np.testing.assert_allclose(p_str, p_std, rtol=1e-6)
    np.testing.assert_allclose(r_str, r_std, rtol=1e-6)


def test_streaming_sequence_mrr_on_mesh_matches():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.parallel import make_mesh

    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=8)
    test = test.to_sequence(max_sequence_length=8)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', n_iter=2, batch_size=64,
        mesh=make_mesh(data=2, model=4),
        random_state=np.random.RandomState(42))
    model.fit(train)

    standard = sequence_mrr_score(model, test, streaming=False)
    streamed = sequence_mrr_score(model, test, streaming=True)
    # Rank jitter near ties from per-shard matmul accumulation order.
    np.testing.assert_allclose(streamed, standard, rtol=0.05, atol=5e-3)
    assert abs(streamed.mean() - standard.mean()) < 1e-3
