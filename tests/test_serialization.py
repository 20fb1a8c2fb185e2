"""Serialization round-trips (reference:
`/root/reference/tests/test_serialization.py:49-108`): save → load must
reproduce metrics *exactly* and allow training to resume."""

import io

import numpy as np
import pytest

from spotlight_tpu.data import (random_train_test_split,
                                user_based_train_test_split)
from spotlight_tpu.evaluation import mrr_score, rmse_score, sequence_mrr_score
from spotlight_tpu.factorization import (ExplicitFactorizationModel,
                                         ImplicitFactorizationModel)
from spotlight_tpu.sequence import ImplicitSequenceModel
from spotlight_tpu.utils import serialization

from tests._fixtures import factorization_dataset, sequential_dataset


def _roundtrip(model):
    buf = io.BytesIO()
    serialization.save(model, buf)
    buf.seek(0)
    return serialization.load(buf)


def test_implicit_factorization_roundtrip():
    interactions = factorization_dataset(
        num_users=200, num_items=150, num_interactions=8000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, random_state=np.random.RandomState(42))
    model.fit(train)
    mrr_before = mrr_score(model, test, train=train)

    loaded = _roundtrip(model)
    mrr_after = mrr_score(loaded, test, train=train)
    np.testing.assert_array_equal(mrr_before, mrr_after)

    # Training resumes on the loaded model (optimizer state survived).
    loaded.fit(train)
    assert not np.array_equal(
        np.asarray(loaded._params['user_embeddings']['weight']),
        np.asarray(model._params['user_embeddings']['weight']))


def test_explicit_factorization_roundtrip():
    interactions = factorization_dataset(
        num_users=200, num_items=150, num_interactions=8000, explicit=True)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    model = ExplicitFactorizationModel(
        n_iter=2, random_state=np.random.RandomState(42))
    model.fit(train)
    rmse_before = rmse_score(model, test)

    loaded = _roundtrip(model)
    assert rmse_score(loaded, test) == rmse_before


@pytest.mark.parametrize('representation', ['pooling', 'lstm', 'cnn',
                                            'mixture'])
def test_sequence_roundtrip(representation):
    interactions = sequential_dataset(
        num_users=50, num_items=60, num_interactions=3000,
        concentration_parameter=0.01)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))
    train = train.to_sequence(max_sequence_length=10)
    test = test.to_sequence(max_sequence_length=10)

    model = ImplicitSequenceModel(
        representation=representation, n_iter=2,
        random_state=np.random.RandomState(42))
    model.fit(train)
    mrr_before = sequence_mrr_score(model, test)

    loaded = _roundtrip(model)
    mrr_after = sequence_mrr_score(loaded, test)
    np.testing.assert_array_equal(mrr_before, mrr_after)
