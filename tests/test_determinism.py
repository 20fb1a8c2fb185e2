"""Bitwise run-to-run determinism given the same random_state — the
foundation of the serialization exact-equality contract and reproducible
experiments."""

import numpy as np

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import mrr_score, sequence_mrr_score
from spotlight_tpu.factorization import ImplicitFactorizationModel
from spotlight_tpu.sequence import ImplicitSequenceModel

from tests._fixtures import factorization_dataset, sequential_dataset


def test_factorization_training_deterministic():
    interactions = factorization_dataset(
        num_users=120, num_items=90, num_interactions=4000)
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    def run():
        model = ImplicitFactorizationModel(
            loss='bpr', n_iter=2, batch_size=512,
            random_state=np.random.RandomState(7))
        model.fit(train)
        return mrr_score(model, test)

    np.testing.assert_array_equal(run(), run())


def test_sequence_training_deterministic():
    interactions = sequential_dataset(
        num_users=40, num_items=50, num_interactions=2000,
        concentration_parameter=0.01)
    sequences = interactions.to_sequence(max_sequence_length=8)

    def run():
        model = ImplicitSequenceModel(
            loss='adaptive_hinge', representation='lstm', n_iter=2,
            random_state=np.random.RandomState(7))
        model.fit(sequences)
        return sequence_mrr_score(model, sequences)

    np.testing.assert_array_equal(run(), run())
