"""Tests for dataset splitting (reference: tests/test_cross_validation.py)."""

import numpy as np

from spotlight_tpu.data import (random_train_test_split,
                                user_based_train_test_split)

from tests._fixtures import sequential_dataset


def _data(random_state):
    del random_state
    return sequential_dataset(num_users=500, num_items=200,
                              num_interactions=10000,
                              concentration_parameter=0.1)


def test_random_split_sizes(random_state):
    interactions = _data(random_state)
    train, test = random_train_test_split(
        interactions, test_percentage=0.2, random_state=random_state)
    assert len(train) + len(test) == len(interactions)
    assert abs(len(test) / len(interactions) - 0.2) < 0.01
    assert train.num_users == test.num_users == interactions.num_users
    assert train.num_items == test.num_items == interactions.num_items


def test_user_based_split_disjoint_users(random_state):
    interactions = _data(random_state)
    train, test = user_based_train_test_split(
        interactions, test_percentage=0.2, random_state=random_state)
    assert len(train) + len(test) == len(interactions)
    assert len(np.intersect1d(np.unique(train.user_ids),
                              np.unique(test.user_ids))) == 0
    user_fraction = (len(np.unique(test.user_ids)) /
                     len(np.unique(interactions.user_ids)))
    assert abs(user_fraction - 0.2) < 0.06


def test_shuffle_preserves_alignment(random_state):
    from spotlight_tpu.data import shuffle_interactions

    interactions = _data(random_state)
    shuffled = shuffle_interactions(interactions, random_state=random_state)

    # Each (user, item, timestamp) triplet must survive intact.
    original = set(zip(interactions.user_ids.tolist(),
                       interactions.item_ids.tolist(),
                       interactions.timestamps.tolist()))
    after = set(zip(shuffled.user_ids.tolist(),
                    shuffled.item_ids.tolist(),
                    shuffled.timestamps.tolist()))
    assert original == after
    assert not np.array_equal(interactions.user_ids, shuffled.user_ids)
