"""Statistical learning gates for explicit factorization
(reference: `/root/reference/tests/factorization/test_explicit.py`)."""

import numpy as np
import pytest

from spotlight_tpu.data import Interactions, random_train_test_split
from spotlight_tpu.evaluation import rmse_score
from spotlight_tpu.factorization import ExplicitFactorizationModel

from tests._fixtures import factorization_dataset

RANDOM_SEED = 42


def _data():
    interactions = factorization_dataset(
        num_users=600, num_items=400, num_interactions=30000,
        rank=8, noise=0.15, explicit=True)
    return random_train_test_split(
        interactions, random_state=np.random.RandomState(0))


def test_regression():
    train, test = _data()
    model = ExplicitFactorizationModel(
        loss='regression', embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-2, l2=1e-6,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)

    rmse = rmse_score(model, test)
    mean_baseline = np.sqrt(
        ((test.ratings - train.ratings.mean()) ** 2).mean())
    # Clearly better than predicting the global mean rating.
    assert rmse < 0.85
    assert rmse < mean_baseline * 0.65


def test_poisson():
    train, test = _data()
    model = ExplicitFactorizationModel(
        loss='poisson', embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-3, l2=1e-6,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)

    rmse = rmse_score(model, test)
    mean_baseline = np.sqrt(
        ((test.ratings - train.ratings.mean()) ** 2).mean())
    assert rmse < mean_baseline
    # Poisson predictions are rates: strictly positive.
    assert (model.predict(0) > 0).all()


def test_logistic():
    train, test = _data()

    def signs(interactions):
        return Interactions(
            interactions.user_ids, interactions.item_ids,
            ratings=np.where(interactions.ratings >= 3, 1.0, -1.0).astype(
                np.float32),
            timestamps=interactions.timestamps,
            num_users=interactions.num_users,
            num_items=interactions.num_items)

    train, test = signs(train), signs(test)
    model = ExplicitFactorizationModel(
        loss='logistic', embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-2, l2=1e-6,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)

    # Predictions are probabilities.
    predictions = model.predict(test.user_ids, test.item_ids)
    assert ((predictions >= 0) & (predictions <= 1)).all()
    # Better than chance at classifying likes.
    accuracy = ((predictions > 0.5) == (test.ratings > 0)).mean()
    base_rate = max((train.ratings > 0).mean(),
                    1 - (train.ratings > 0).mean())
    assert accuracy > base_rate + 0.03


def test_degenerate_loss_raises():
    train, _ = _data()
    model = ExplicitFactorizationModel(
        n_iter=1, learning_rate=1e12,
        random_state=np.random.RandomState(RANDOM_SEED))
    with pytest.raises(ValueError, match='Degenerate epoch loss'):
        for _ in range(30):
            model.fit(train)
