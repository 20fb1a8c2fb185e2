"""Dataset loader tests against locally generated HDF5 fixtures.

The real downloads are unavailable in CI; these fixtures have the exact
HDF5 schema the loaders expect, so the full load/filter/remap paths are
exercised offline."""

import os

import h5py
import numpy as np
import pytest


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv('SPOTLIGHT_DATA_DIR', str(tmp_path))
    return tmp_path


def test_movielens_loader_from_fixture(data_dir, random_state):
    path = data_dir / 'movielens' / 'v0.2.0'
    os.makedirs(path)
    n = 1000
    # Cache filename quirk inherited from the reference
    # (`datasets/movielens.py:33-36`): the prefix is applied twice.
    with h5py.File(path / 'movielens_movielens_100K.hdf5', 'w') as f:
        f['/user_id'] = random_state.randint(0, 50, n).astype(np.int32)
        f['/item_id'] = random_state.randint(0, 80, n).astype(np.int32)
        f['/rating'] = random_state.randint(1, 6, n).astype(np.float32)
        f['/timestamp'] = np.arange(n, dtype=np.int32)

    from spotlight_tpu.data.movielens import get_movielens_dataset

    interactions = get_movielens_dataset('100K')
    assert len(interactions) == n
    assert interactions.num_users == 50
    assert interactions.num_items == 80
    assert interactions.ratings.min() >= 1


def test_goodbooks_loader_from_fixture(data_dir, random_state):
    path = data_dir / 'goodbooks'
    os.makedirs(path)
    n = 500
    ratings = np.stack([
        random_state.randint(0, 30, n),
        random_state.randint(0, 40, n),
        random_state.randint(1, 6, n),
    ], axis=1)
    with h5py.File(path / 'goodbooks.hdf5', 'w') as f:
        f['ratings'] = ratings

    from spotlight_tpu.data.goodbooks import get_goodbooks_dataset

    interactions = get_goodbooks_dataset()
    assert len(interactions) == n
    np.testing.assert_array_equal(interactions.user_ids, ratings[:, 0])
    np.testing.assert_array_equal(interactions.item_ids, ratings[:, 1])
    assert interactions.timestamps is not None


def test_amazon_loader_from_fixture(data_dir, random_state):
    path = data_dir / 'amazon'
    os.makedirs(path)
    n = 2000
    user_ids = random_state.randint(0, 60, n)
    item_ids = random_state.randint(0, 90, n)
    with h5py.File(path / 'amazon_co_purchasing.hdf5', 'w') as f:
        f['/user_id'] = user_ids
        f['/item_id'] = item_ids
        f['/rating'] = random_state.randint(1, 6, n).astype(np.float32)
        f['/timestamp'] = np.arange(n, dtype=np.int64)
        f['/features_item_id'] = np.zeros(1, dtype=np.int64)
        f['/features_feature_id'] = np.zeros(1, dtype=np.int64)

    from spotlight_tpu.data.amazon import get_amazon_dataset

    interactions = get_amazon_dataset(min_user_interactions=10,
                                      min_item_interactions=10)

    # Every surviving user/item met the count thresholds in the raw data,
    # and ids were remapped to a contiguous range starting at 1.
    assert len(interactions) > 0
    assert interactions.user_ids.min() >= 1
    assert interactions.item_ids.min() >= 1
    assert interactions.num_users == len(np.unique(interactions.user_ids)) + 1
    assert interactions.num_items == len(np.unique(interactions.item_ids)) + 1

    # Reference-semantics check: filters are applied on raw counts.
    raw_user_counts = {u: c for u, c in
                       zip(*np.unique(user_ids, return_counts=True))}
    surviving_users = np.unique(user_ids[np.isin(
        user_ids, [u for u, c in raw_user_counts.items() if c >= 10])])
    assert len(np.unique(interactions.user_ids)) <= len(surviving_users)
