"""Exact-output and invariant tests for the sequence conversion pipeline.

Ports the reference's cheapest, fully deterministic parity checks
(`/root/reference/tests/test_interactions.py`), running against synthetic data
instead of a downloaded MovieLens copy.
"""

import numpy as np
import pytest

from spotlight_tpu.data import (Interactions, random_train_test_split)

from tests._fixtures import sequential_dataset


def _check_window_invariants(sequence_users, sequences, step_size,
                             interactions):
    """The reference's full battery of windowing invariants
    (`tests/test_interactions.py:10-64`), in one pass:

    - no all-padding rows, and the final column is always a real item;
    - consecutive rows of the same user are shifted copies (stride = step);
    - within each window, items appear in that user's timestamp order.
    """
    assert (sequences.sum(axis=1) > 0).all()
    assert (sequences[:, -1] > 0).all()

    same_user = sequence_users[1:] == sequence_users[:-1]
    for i in np.where(same_user)[0] + 1:
        np.testing.assert_array_equal(sequences[i][step_size:],
                                      sequences[i - 1][:-step_size])

    timestamp_lookup = interactions.tocoo()
    timestamp_lookup.data = interactions.timestamps
    timestamp_lookup = timestamp_lookup.tocsr()
    for user_id, row in zip(sequence_users, sequences):
        window = row[row != 0]
        stamps = np.asarray(
            [timestamp_lookup[user_id, item] for item in window])
        assert (np.diff(stamps) >= 0).all()


def test_known_output_step_1():
    interactions = Interactions(np.zeros(5, dtype=np.int32),
                                np.arange(5, dtype=np.int32) + 1,
                                timestamps=np.arange(5, dtype=np.int32))
    sequences = interactions.to_sequence(max_sequence_length=5,
                                         step_size=1).sequences
    expected = np.array([
        [1, 2, 3, 4, 5],
        [0, 1, 2, 3, 4],
        [0, 0, 1, 2, 3],
        [0, 0, 0, 1, 2],
        [0, 0, 0, 0, 1],
    ])
    assert np.all(sequences == expected)


def test_known_output_step_2():
    interactions = Interactions(np.zeros(5, dtype=np.int32),
                                np.arange(5, dtype=np.int32) + 1,
                                timestamps=np.arange(5, dtype=np.int32))
    sequences = interactions.to_sequence(max_sequence_length=5,
                                         step_size=2).sequences
    expected = np.array([
        [1, 2, 3, 4, 5],
        [0, 0, 1, 2, 3],
        [0, 0, 0, 0, 1],
    ])
    assert np.all(sequences == expected)


def test_zero_item_id_rejected():
    interactions = Interactions(np.zeros(5, dtype=np.int32),
                                np.arange(5, dtype=np.int32),
                                timestamps=np.arange(5, dtype=np.int32))
    with pytest.raises(ValueError):
        interactions.to_sequence()


def test_no_timestamps_rejected():
    interactions = Interactions(np.zeros(5, dtype=np.int32),
                                np.arange(5, dtype=np.int32) + 1)
    with pytest.raises(ValueError):
        interactions.to_sequence()


@pytest.mark.parametrize('max_sequence_length, step_size', [
    (5, 1),
    (5, 3),
    (20, 1),
    (20, 4),
    (128, 128),
    (128, 5),
])
def test_to_sequence(max_sequence_length, step_size):
    interactions = sequential_dataset(
        num_users=100, num_items=200, num_interactions=2000,
        concentration_parameter=0.1)
    _, interactions = random_train_test_split(
        interactions, random_state=np.random.RandomState(42))
    # The temporal-order oracle below relies on unique (user, item) pairs
    # (it inverts a COO timestamp matrix); keep first occurrences only.
    pair_ids = (interactions.user_ids.astype(np.int64) *
                interactions.num_items + interactions.item_ids)
    order = np.lexsort((interactions.timestamps, pair_ids))
    keep_sorted = np.ones(len(pair_ids), dtype=bool)
    keep_sorted[1:] = pair_ids[order][1:] != pair_ids[order][:-1]
    keep = np.zeros(len(pair_ids), dtype=bool)
    keep[order[keep_sorted]] = True
    interactions = Interactions(interactions.user_ids[keep],
                                interactions.item_ids[keep],
                                timestamps=interactions.timestamps[keep],
                                num_users=interactions.num_users,
                                num_items=interactions.num_items)

    sequences = interactions.to_sequence(
        max_sequence_length=max_sequence_length,
        step_size=step_size)

    if step_size == 1:
        assert sequences.sequences.shape == (len(interactions),
                                             max_sequence_length)
    else:
        assert sequences.sequences.shape[1] == max_sequence_length

    _check_window_invariants(sequences.user_ids, sequences.sequences,
                             step_size, interactions)


def test_to_sequence_min_length():
    min_sequence_length = 10
    interactions = sequential_dataset(
        num_users=100, num_items=200, num_interactions=2000,
        concentration_parameter=0.1)

    sequences = interactions.to_sequence(max_sequence_length=20)
    assert np.any(
        (sequences.sequences != 0).sum(axis=1) < min_sequence_length)

    sequences = interactions.to_sequence(
        max_sequence_length=20, min_sequence_length=min_sequence_length)
    assert not np.any(
        (sequences.sequences != 0).sum(axis=1) < min_sequence_length)


def test_ids_beyond_int32_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match='int32 range'):
        Interactions(np.array([2 ** 31 + 5], dtype=np.int64),
                     np.array([1], dtype=np.int64))


def test_empty_interactions():
    # With explicit dims, an empty dataset is valid and round-trips.
    empty = Interactions(np.array([], dtype=np.int64),
                         np.array([], dtype=np.int64),
                         num_users=5, num_items=7)
    assert len(empty) == 0
    assert empty.tocsr().shape == (5, 7)

    # Without dims there is nothing to infer from: loud error, not an
    # opaque zero-size reduction failure.
    with pytest.raises(ValueError, match='empty'):
        Interactions(np.array([], dtype=np.int64),
                     np.array([], dtype=np.int64))

    with pytest.raises(ValueError, match='equal length'):
        Interactions(np.array([1, 2]), np.array([1]))


def test_empty_sequence_interactions_requires_num_items():
    from spotlight_tpu.data.interactions import SequenceInteractions

    with pytest.raises(ValueError, match='num_items'):
        SequenceInteractions(np.zeros((0, 5), dtype=np.int32))
    seq = SequenceInteractions(np.zeros((0, 5), dtype=np.int32), num_items=9)
    assert seq.num_items == 9
