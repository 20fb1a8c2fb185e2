"""ML-1M-scale fixture: generation invariants + loader round-trip.

The sequence-model sweep (`examples/movielens_sequence/`) and the
reference head-to-head (`scripts/parity_ml1m_sequence.py`) run on this
fixture; these tests pin the scale and structure they rely on.
"""

import numpy as np
import pytest

from spotlight_tpu.data import fixtures


@pytest.fixture(scope='module')
def columns():
    return fixtures.generate_movielens_1m_like()


def test_scale_matches_real_ml1m(columns):
    assert len(columns['user_id']) == fixtures.ML1M_NUM_RATINGS
    assert columns['user_id'].min() == 0
    assert columns['user_id'].max() == fixtures.ML1M_NUM_USERS - 1
    # Item ids are 1-based: 0 is reserved for sequence padding.
    assert columns['item_id'].min() >= 1
    assert columns['item_id'].max() <= fixtures.ML1M_NUM_ITEMS
    counts = np.bincount(columns['user_id'])
    assert counts.min() >= 20          # to_sequence min_sequence_length=20
    assert counts.max() <= 2314        # the real dataset's most active user
    assert 150 <= counts.mean() <= 180


def test_ratings_and_timestamps(columns):
    assert set(np.unique(columns['rating'])) <= {1.0, 2.0, 3.0, 4.0, 5.0}
    # Timestamps strictly increase within (and across) users, so
    # to_sequence's (user, timestamp) lexsort reproduces generation order.
    assert np.all(np.diff(columns['timestamp']) > 0)


def test_sequential_signal_is_low_rank_learnable(columns):
    """Bigram structure must beat popularity — the property that makes the
    sweep's LSTM-vs-pooling ordering meaningful."""
    items = columns['item_id'] - 1
    users = columns['user_id']
    same_user = users[1:] == users[:-1]
    src = items[:-1][same_user]
    dst = items[1:][same_user]
    n_items = fixtures.ML1M_NUM_ITEMS
    popularity = np.bincount(items, minlength=n_items)
    pop_rank = (-popularity).argsort().argsort() + 1

    # Empirical-bigram oracle, fit/held-out split over transitions.
    half = len(src) // 2
    counts = {}
    for s, d in zip(src[:half], dst[:half]):
        counts.setdefault(s, {}).setdefault(d, 0)
        counts[s][d] += 1
    rng = np.random.RandomState(0)
    sample = rng.choice(np.arange(half, len(src)), 4000, replace=False)
    hits = 0
    pop_rr = []
    for idx in sample:
        s, d = src[idx], dst[idx]
        row = counts.get(s, {})
        topk = sorted(row, key=row.get, reverse=True)[:10]
        hits += d in topk
        pop_rr.append(1.0 / pop_rank[d])
    bigram_hit10 = hits / len(sample)
    pop_mrr = np.mean(pop_rr)
    # Sequential signal: top-10 bigram recall far above chance (10/3706).
    assert bigram_hit10 > 0.15, bigram_hit10
    # Popularity alone sits in the published pooling band, not higher.
    assert 0.005 < pop_mrr < 0.04, pop_mrr


def test_loader_round_trip(tmp_path, monkeypatch, columns):
    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    path = fixtures.install_movielens_1m_fixture(columns=columns)
    assert fixtures.is_synthetic_fixture(path)
    # Idempotent: never overwrites an existing cache file.
    assert fixtures.install_movielens_1m_fixture() == path

    from spotlight_tpu.data.movielens import get_movielens_dataset

    interactions = get_movielens_dataset('1M')
    assert len(interactions) == fixtures.ML1M_NUM_RATINGS
    assert interactions.num_users == fixtures.ML1M_NUM_USERS
    assert interactions.num_items == fixtures.ML1M_NUM_ITEMS + 1
