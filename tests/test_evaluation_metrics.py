"""Metric-math parity tests.

The batched device metrics must agree exactly (to float tolerance) with a
straightforward host reimplementation of the reference's evaluation loops
(`/root/reference/spotlight/evaluation.py:42-55,188-220`), including
``scipy.stats.rankdata`` average-rank tie handling and FLOAT_MAX train-item
masking."""

import numpy as np
import pytest
import scipy.stats as st

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import (FLOAT_MAX, mrr_score,
                                      precision_recall_score, rmse_score,
                                      sequence_mrr_score,
                                      sequence_precision_recall_score)
from spotlight_tpu.factorization import ImplicitFactorizationModel
from spotlight_tpu.sequence import ImplicitSequenceModel

from tests._fixtures import factorization_dataset, sequential_dataset


@pytest.fixture(scope='module')
def fitted_factorization():
    interactions = factorization_dataset(
        num_users=200, num_items=150, num_interactions=8000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=3, batch_size=1024,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


@pytest.fixture(scope='module')
def fitted_sequence():
    interactions = sequential_dataset(
        num_users=50, num_items=60, num_interactions=3000,
        concentration_parameter=0.01)
    from spotlight_tpu.data import user_based_train_test_split
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=10)
    test = test.to_sequence(max_sequence_length=10)
    model = ImplicitSequenceModel(
        loss='bpr', representation='lstm', n_iter=3,
        random_state=np.random.RandomState(42))
    model.fit(train)
    return train, test, model


def _reference_mrr(model, test, train=None):
    """Host reimplementation of the reference's per-user loop."""
    test = test.tocsr()
    if train is not None:
        train = train.tocsr()
    mrrs = []
    for user_id, row in enumerate(test):
        if not len(row.indices):
            continue
        predictions = -model.predict(user_id)
        if train is not None:
            predictions[train[user_id].indices] = FLOAT_MAX
        mrr = (1.0 / st.rankdata(predictions)[row.indices]).mean()
        mrrs.append(mrr)
    return np.array(mrrs)


def _reference_precision_recall(model, test, train=None, k=10):
    test = test.tocsr()
    if train is not None:
        train = train.tocsr()
    precision, recall = [], []
    for user_id, row in enumerate(test):
        if not len(row.indices):
            continue
        predictions = -model.predict(user_id)
        if train is not None:
            predictions[train[user_id].indices] = FLOAT_MAX
        top = predictions.argsort()[:k]
        hits = len(set(top).intersection(set(row.indices)))
        precision.append(hits / len(top))
        recall.append(hits / len(row.indices))
    return np.array(precision), np.array(recall)


def test_mrr_matches_reference_loop(fitted_factorization):
    train, test, model = fitted_factorization
    ours = mrr_score(model, test, train=train)
    theirs = _reference_mrr(model, test, train=train)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_mrr_without_train_mask(fitted_factorization):
    _, test, model = fitted_factorization
    np.testing.assert_allclose(mrr_score(model, test),
                               _reference_mrr(model, test),
                               rtol=1e-4, atol=1e-6)


def test_mrr_tie_handling():
    """Average ranks under massive ties (constant scores)."""

    class ConstantModel:
        def predict(self, user_id):
            return np.zeros(10, dtype=np.float32)

    from spotlight_tpu.data import Interactions
    test = Interactions(np.array([0, 1]), np.array([3, 7]),
                        num_users=2, num_items=10)
    ours = mrr_score(ConstantModel(), test)
    # All items tied: rankdata gives every item rank 5.5.
    np.testing.assert_allclose(ours, [1 / 5.5, 1 / 5.5], rtol=1e-6)


def test_precision_recall_matches_reference_loop(fitted_factorization):
    train, test, model = fitted_factorization
    ours_p, ours_r = precision_recall_score(model, test, train=train, k=10)
    theirs_p, theirs_r = _reference_precision_recall(
        model, test, train=train, k=10)
    np.testing.assert_allclose(ours_p, theirs_p, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(ours_r, theirs_r, rtol=1e-6, atol=1e-7)


def test_precision_recall_vector_k(fitted_factorization):
    train, test, model = fitted_factorization
    ks = np.array([1, 5, 10])
    precision, recall = precision_recall_score(model, test, train=train,
                                               k=ks)
    assert precision.shape == (len(precision), len(ks))
    assert recall.shape == precision.shape
    for j, k in enumerate(ks):
        p_k, r_k = precision_recall_score(model, test, train=train,
                                          k=int(k))
        np.testing.assert_allclose(precision[:, j], p_k, rtol=1e-6)
        np.testing.assert_allclose(recall[:, j], r_k, rtol=1e-6)


def test_sequence_mrr_matches_reference_loop(fitted_sequence):
    _, test, model = fitted_sequence
    ours = sequence_mrr_score(model, test)

    sequences = test.sequences[:, :-1]
    targets = test.sequences[:, -1:]
    theirs = []
    for i in range(len(sequences)):
        predictions = -model.predict(sequences[i])
        theirs.append(
            (1.0 / st.rankdata(predictions)[targets[i]]).mean())
    np.testing.assert_allclose(ours, np.array(theirs), rtol=1e-4,
                               atol=1e-6)


def test_sequence_mrr_exclude_preceding(fitted_sequence):
    _, test, model = fitted_sequence
    ours = sequence_mrr_score(model, test, exclude_preceding=True)

    sequences = test.sequences[:, :-1]
    targets = test.sequences[:, -1:]
    theirs = []
    for i in range(len(sequences)):
        predictions = -model.predict(sequences[i])
        predictions[sequences[i]] = FLOAT_MAX
        theirs.append(
            (1.0 / st.rankdata(predictions)[targets[i]]).mean())
    np.testing.assert_allclose(ours, np.array(theirs), rtol=1e-4,
                               atol=1e-6)


def test_sequence_precision_recall_equal_when_k_matches(fitted_sequence):
    """P@k == R@k when each sequence contributes exactly k targets
    (reference `tests/test_evaluation_metrics.py:73-113`)."""
    _, test, model = fitted_sequence
    k = 5
    precision, recall = sequence_precision_recall_score(model, test, k=k)
    assert precision.shape == (len(test.sequences),)
    np.testing.assert_allclose(precision, recall, rtol=1e-6)


def test_rmse():
    class MeanModel:
        def predict(self, user_ids, item_ids=None):
            return np.full(len(user_ids), 3.0, dtype=np.float32)

    from spotlight_tpu.data import Interactions
    test = Interactions(np.array([0, 1]), np.array([1, 2]),
                        ratings=np.array([2.0, 4.0], dtype=np.float32))
    assert abs(rmse_score(MeanModel(), test) - 1.0) < 1e-6
