"""API-consistency contracts
(reference: `/root/reference/tests/factorization/test_api.py:19-36`):
``predict(uid)``, ``predict(uid, item_ids)``, and ``predict(uids, item_ids)``
must agree elementwise."""

import numpy as np
import pytest

from spotlight_tpu.factorization import (ExplicitFactorizationModel,
                                         ImplicitFactorizationModel)

from tests._fixtures import factorization_dataset


@pytest.mark.parametrize('model_class', [
    ImplicitFactorizationModel,
    ExplicitFactorizationModel,
])
def test_predict_consistency(model_class):
    interactions = factorization_dataset(
        num_users=200, num_items=150, num_interactions=5000, explicit=True)

    model = model_class(n_iter=1,
                        random_state=np.random.RandomState(42))
    model.fit(interactions)

    for user_id in np.random.RandomState(0).randint(
            0, interactions.num_users, size=5):
        user_id = int(user_id)
        user_ids = np.repeat(user_id, interactions.num_items)
        item_ids = np.arange(interactions.num_items)

        uid_predictions = model.predict(user_id)
        iid_predictions = model.predict(user_id, item_ids)
        pair_predictions = model.predict(user_ids, item_ids)

        assert uid_predictions.shape == (interactions.num_items,)
        np.testing.assert_allclose(uid_predictions, iid_predictions,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(uid_predictions, pair_predictions,
                                   rtol=1e-5, atol=1e-5)


def test_sequence_predict_consistency():
    from spotlight_tpu.sequence import ImplicitSequenceModel

    from tests._fixtures import sequential_dataset

    interactions = sequential_dataset(
        num_users=50, num_items=60, num_interactions=2000,
        concentration_parameter=0.1)
    sequences = interactions.to_sequence(max_sequence_length=10)

    model = ImplicitSequenceModel(
        n_iter=1, random_state=np.random.RandomState(42))
    model.fit(sequences)

    seq = sequences.sequences[0]
    all_scores = model.predict(seq)
    assert all_scores.shape == (sequences.num_items,)

    item_ids = np.array([1, 5, 7])
    subset = model.predict(seq, item_ids=item_ids)
    np.testing.assert_allclose(subset, all_scores[item_ids],
                               rtol=1e-5, atol=1e-5)


def test_unfitted_predict_raises_clearly():
    model = ImplicitFactorizationModel()
    with pytest.raises(RuntimeError, match='call fit'):
        model.predict(0)

    from spotlight_tpu.sequence import ImplicitSequenceModel

    seq_model = ImplicitSequenceModel()
    with pytest.raises(RuntimeError, match='call fit'):
        seq_model.predict(np.array([1, 2, 3]))


def test_predict_matches_manual_numpy_math(random_state):
    """predict() equals the from-scratch numpy computation on raw params:
    dot(user_vec, item_vec) + user_bias + item_bias."""
    interactions = factorization_dataset(
        num_users=80, num_items=60, num_interactions=2000)
    model = ImplicitFactorizationModel(
        n_iter=1, random_state=np.random.RandomState(3))
    model.fit(interactions)

    # Fused layout: factors in columns [:D], bias in column D.
    Uw = np.asarray(model._params['user_embeddings']['weight'])
    Iw = np.asarray(model._params['item_embeddings']['weight'])
    U, bu = Uw[:, :-1], Uw[:, -1]
    I, bi = Iw[:, :-1], Iw[:, -1]

    users = random_state.randint(0, 80, 32)
    items = random_state.randint(0, 60, 32)
    expected = (U[users] * I[items]).sum(1) + bu[users] + bi[items]
    got = model.predict(users, items)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    # Catalog path for one user.
    got_catalog = model.predict(int(users[0]))
    expected_catalog = U[users[0]] @ I.T + bu[users[0]] + bi
    np.testing.assert_allclose(got_catalog, expected_catalog,
                               rtol=1e-5, atol=1e-5)
