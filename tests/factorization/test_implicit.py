"""Statistical learning gates for implicit factorization.

The reference gates MRR on a downloaded MovieLens-100K
(`/root/reference/tests/factorization/test_implicit.py:37-57`); this
network-free port uses the synthetic low-rank generator with gates calibrated
the same way (trained model must clearly beat the untrained/chance level).
"""

import numpy as np
import pytest

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import mrr_score
from spotlight_tpu.factorization import (BilinearNet,
                                         ImplicitFactorizationModel)
from spotlight_tpu.ops import BloomEmbedding

from tests._fixtures import factorization_dataset

RANDOM_SEED = 42
EPSILON = 0.005


def _data():
    interactions = factorization_dataset(
        num_users=600, num_items=400, num_interactions=30000,
        rank=8, noise=0.15)
    return random_train_test_split(
        interactions, random_state=np.random.RandomState(0))


def _model_mrr(model, train, test):
    model.fit(train)
    return mrr_score(model, test, train=train).mean()


@pytest.mark.parametrize('loss, expected_mrr', [
    ('pointwise', 0.035),
    ('bpr', 0.035),
    ('hinge', 0.035),
    ('adaptive_hinge', 0.035),
])
def test_implicit_losses(loss, expected_mrr):
    train, test = _data()
    model = ImplicitFactorizationModel(
        loss=loss, embedding_dim=32, n_iter=10, batch_size=1024,
        learning_rate=1e-2, l2=1e-6,
        random_state=np.random.RandomState(RANDOM_SEED))
    mrr = _model_mrr(model, train, test)
    assert mrr + EPSILON > expected_mrr


def test_untrained_model_is_at_chance():
    """The gates above are meaningful: an untrained model scores an order
    of magnitude lower."""
    train, test = _data()
    model = ImplicitFactorizationModel(
        n_iter=10, random_state=np.random.RandomState(RANDOM_SEED))
    model._initialize(train)
    mrr = mrr_score(model, test, train=train).mean()
    assert mrr < 0.02


@pytest.mark.parametrize('compression_ratio, expected_mrr', [
    (0.5, 0.012),
    (1.0, 0.018),
    (1.5, 0.018),  # ratios > 1 expand the table (reference CI covers this)
])
def test_bloom_embeddings(compression_ratio, expected_mrr):
    train, test = _data()
    representation = BilinearNet(
        train.num_users, train.num_items, 32,
        user_embedding_layer=BloomEmbedding(
            train.num_users, 32, compression_ratio=compression_ratio),
        item_embedding_layer=BloomEmbedding(
            train.num_items, 32, compression_ratio=compression_ratio))
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=10, batch_size=1024, learning_rate=1e-2,
        l2=1e-6, representation=representation,
        random_state=np.random.RandomState(RANDOM_SEED))
    mrr = _model_mrr(model, train, test)
    assert mrr + EPSILON > expected_mrr


def test_degenerate_loss_raises():
    """Exploding losses must raise, matching the reference guard
    (`factorization/implicit.py:250-252`; extended to cover XLA's
    inf-saturation — see ``training.check_degenerate``).  Uses the
    unbounded hinge loss with plain SGD (also exercising the
    ``optimizer_func`` escape hatch): Adam's normalized updates bound the
    divergence rate, sigmoid losses cannot diverge at all."""
    import optax

    train, _ = _data()
    model = ImplicitFactorizationModel(
        loss='hinge', n_iter=1, optimizer_func=optax.sgd(1e10),
        random_state=np.random.RandomState(RANDOM_SEED))
    with pytest.raises(ValueError, match='Degenerate epoch loss'):
        for _ in range(20):
            model.fit(train)


def test_resume_fitting_continues():
    """Repeated fit() calls resume rather than reinitialize
    (`factorization/implicit.py:188-190`)."""
    train, test = _data()
    model = ImplicitFactorizationModel(
        loss='bpr', n_iter=2, batch_size=1024, learning_rate=1e-2,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    # Copy to host before refitting: fit donates the parameter buffers
    # (in-place table updates), invalidating old device references.
    params_before = np.asarray(model._params['user_embeddings']['weight'])
    model.fit(train)
    params_after = np.asarray(model._params['user_embeddings']['weight'])
    assert not np.allclose(params_before, params_after)


def test_input_validation():
    train, _ = _data()
    model = ImplicitFactorizationModel(
        n_iter=1, random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    with pytest.raises(ValueError, match='user id'):
        model.predict(train.num_users + 10)
    with pytest.raises(ValueError, match='item id'):
        model.predict(0, np.array([train.num_items + 10]))
