"""The README quickstart flow must run end to end (smaller sizes)."""

import numpy as np


def test_readme_quickstart_flow():
    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    from tests._fixtures import sequential_dataset

    interactions = sequential_dataset(
        num_users=50, num_items=60, num_interactions=2000,
        concentration_parameter=0.01)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    model = ImplicitSequenceModel(loss='bpr', representation='lstm',
                                  n_iter=2,
                                  random_state=np.random.RandomState(42))
    model.fit(train.to_sequence(max_sequence_length=10))

    mrr = sequence_mrr_score(model,
                             test.to_sequence(max_sequence_length=10))
    assert mrr.shape[0] > 0
    assert 0.0 < mrr.mean() <= 1.0


def test_parallel_quickstart_flow():
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')

    from spotlight_tpu.data import random_train_test_split
    from spotlight_tpu.factorization import ImplicitFactorizationModel
    from spotlight_tpu.parallel import make_mesh

    from tests._fixtures import factorization_dataset

    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, _ = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    mesh = make_mesh(data=2, model=4)
    model = ImplicitFactorizationModel(loss='bpr', n_iter=1, mesh=mesh,
                                       batch_size=256,
                                       random_state=np.random.RandomState(1))
    model.fit(train)
    assert model.predict(0).shape == (90,)
